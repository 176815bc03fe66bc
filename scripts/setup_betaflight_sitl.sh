#!/bin/bash
# Build per-drone Betaflight SITL instances for BetaAviary
# (counterpart of the reference's assets/clone_bfs.sh: clones betaflight,
#  patches the UDP port plan per drone — PWM 9002+10i, state 9003+10i,
#  RC 9004+10i — and builds the SITL target).
#
# Usage: scripts/setup_betaflight_sitl.sh [num_drones] [dest_dir]
set -e
NUM=${1:-1}
DEST=${2:-betaflight_sitl}
mkdir -p "$DEST"
for ((i=0; i<NUM; i++)); do
  DIR="$DEST/bf$i"
  if [ ! -d "$DIR" ]; then
    git clone --depth 1 https://github.com/betaflight/betaflight "$DIR"
  fi
  pushd "$DIR" >/dev/null
  # shift the SITL UDP ports by 10*i so each drone gets its own plan
  if [ "$i" -gt 0 ]; then
    sed -i "s/PORT_PWM_RAW\s*9001/PORT_PWM_RAW $((9001 + 10 * i))/" src/main/target/SITL/sitl.c
    sed -i "s/PORT_PWM\s*9002/PORT_PWM $((9002 + 10 * i))/" src/main/target/SITL/sitl.c
    sed -i "s/PORT_STATE\s*9003/PORT_STATE $((9003 + 10 * i))/" src/main/target/SITL/sitl.c
    sed -i "s/PORT_RC\s*9004/PORT_RC $((9004 + 10 * i))/" src/main/target/SITL/sitl.c
  fi
  make TARGET=SITL
  popd >/dev/null

  # Generate eeprom.bin from the shipped CLI config (the reference ships a
  # pre-baked binary flash image, assets/eeprom.bin; we derive it from the
  # readable assets/sitl-config.txt instead): boot the SITL once, pipe the
  # config into its CLI console (TCP 5761), `save` reboots it and writes
  # eeprom.bin into the working directory.
  CFG="$(dirname "$0")/../gym_pybullet_drones_tpu/assets/sitl-config.txt"
  if [ -f "$CFG" ] && [ ! -f "$DIR/eeprom.bin" ]; then
    pushd "$DIR" >/dev/null
    ./obj/main/betaflight_SITL.elf &
    SITL_PID=$!
    sleep 2
    { printf '#\n'; cat "$CFG"; sleep 1; } | nc 127.0.0.1 5761 || true
    sleep 2
    kill "$SITL_PID" 2>/dev/null || true
    popd >/dev/null
    [ -f "$DIR/eeprom.bin" ] && echo "eeprom.bin written for bf$i"
  fi
done
echo "SITL binaries under $DEST/bf*/obj/main/betaflight_SITL.elf"
echo "Run BetaAviary(spawn_sitl=True, sitl_path='$DEST') or start them manually."
