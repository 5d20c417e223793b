#!/bin/sh
# Build the native host-runtime library (native/dlse_native.cpp) into
# native/libdlse_native.so. Idempotent; skips when the .so is newer.
set -e
cd "$(dirname "$0")/.."
SRC=native/dlse_native.cpp
OUT=native/libdlse_native.so
if [ -f "$OUT" ] && [ "$OUT" -nt "$SRC" ]; then
    echo "up to date: $OUT"
    exit 0
fi
g++ -O3 -march=native -shared -fPIC -o "$OUT" "$SRC"
echo "built $OUT"
