#!/bin/sh
# Build the native runtime library (async logger).
set -e
DIR="$(cd "$(dirname "$0")" && pwd)"
g++ -O2 -std=c++17 -shared -fPIC -pthread \
    "$DIR/logger.cpp" -o "$DIR/librobogame_native.so"
echo "built $DIR/librobogame_native.so"
