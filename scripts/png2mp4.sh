#!/bin/bash
# Assemble recorded PNG frames into an mp4
# (counterpart of the reference's assets/ffmpeg_png2mp4.sh).
# Usage: scripts/png2mp4.sh results/recording_<timestamp> [out.mp4]
set -e
DIR=${1:?usage: png2mp4.sh <frame_dir> [out.mp4]}
OUT=${2:-video.mp4}
ffmpeg -y -framerate 24 -i "$DIR/frame_%d.png" -pix_fmt yuv420p "$OUT"
