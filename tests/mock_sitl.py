"""Mock Betaflight SITL endpoint (standalone subprocess).

Speaks the reference's wire protocol (reference envs/BetaAviary.py:97-170):
- binds FDM state port 9003+10*i and RC port 9004+10*i,
- validates packet sizes ('@dddddddddddddddddd' = 144 bytes,
  '@dHHHHHHHHHHHHHHHH' = 40 bytes),
- on each RC packet, replies with a servo packet of 4 float32 PWM fractions
  on 9002+10*i computed by a DETERMINISTIC law of the RC channels, so tests
  can assert the closed loop end to end,
- appends every received packet as hex (prefixed FDM:/RC:) to a log file for
  byte-level wire assertions.

Usage: python mock_sitl.py <index> <logfile>
"""
import socket
import struct
import sys


def pwm_law(roll, pitch, thro, yaw, aux1):
    """Deterministic, plausible mixer: throttle base + small rate mixing.

    Disarmed (aux1 < 1500) -> all zeros, like a real SITL before arming.
    """
    if aux1 < 1500:
        return (0.0, 0.0, 0.0, 0.0)
    base = (thro - 1000.0) / 1000.0
    r = (roll - 1500.0) / 500.0
    p = (pitch - 1500.0) / 500.0
    y = (yaw - 1500.0) / 500.0
    mix = [base + 0.1 * (-r + p + y), base + 0.1 * (-r - p - y),
           base + 0.1 * (r - p + y), base + 0.1 * (r + p - y)]
    return tuple(min(1.0, max(0.0, m)) for m in mix)


def main():
    index = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    log_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mock_sitl.log"
    ip = "127.0.0.1"

    s_state = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s_state.bind((ip, 9003 + 10 * index))
    s_state.settimeout(0.01)
    s_rc = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s_rc.bind((ip, 9004 + 10 * index))
    s_rc.settimeout(0.01)
    s_out = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    log = open(log_path, "a")
    print("READY", flush=True)
    while True:
        try:
            data, _ = s_state.recvfrom(1024)
            assert len(data) == struct.calcsize("@dddddddddddddddddd"), \
                f"bad FDM size {len(data)}"
            log.write("FDM:" + data.hex() + "\n")
            log.flush()
        except socket.timeout:
            pass
        try:
            data, _ = s_rc.recvfrom(1024)
            assert len(data) == struct.calcsize("@dHHHHHHHHHHHHHHHH"), \
                f"bad RC size {len(data)}"
            log.write("RC:" + data.hex() + "\n")
            log.flush()
            fields = struct.unpack("@dHHHHHHHHHHHHHHHH", data)
            roll, pitch, thro, yaw, aux1 = fields[1:6]
            pwm = pwm_law(roll, pitch, thro, yaw, aux1)
            s_out.sendto(struct.pack("@ffff", *pwm),
                         (ip, 9002 + 10 * index))
        except socket.timeout:
            pass


if __name__ == "__main__":
    main()
