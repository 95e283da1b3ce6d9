#!/bin/sh
# Build the reference-sim oracle OUT-OF-TREE (reference code stays at
# /root/reference; only our driver tools/oracle_main.cpp lives in this repo).
# Eigen headers come from the tensorflow wheel baked into the image.
set -e
EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
OUT=${1:-/tmp/oracle}
g++ -O2 -std=c++17 \
    -I/root/reference/include -I"$EIGEN" \
    "$(dirname "$0")/oracle_main.cpp" /root/reference/src/GameSim.cpp \
    -o "$OUT"
echo "built $OUT"
