#!/bin/sh
# Build the native augmentation library (data/_native/libaugment.so).
set -e
cd "$(dirname "$0")/.."
SRC=fasterseg_tpu/data/_native/augment.cpp
OUT=fasterseg_tpu/data/_native/libaugment.so
g++ -O3 -march=native -shared -fPIC -std=c++17 -o "$OUT" "$SRC"
echo "built $OUT"
