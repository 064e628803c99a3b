#!/bin/sh
# Build the native host ops into native/build/libtileio.so.
# cmake+ninja when available; plain g++ fallback otherwise.
set -e
cd "$(dirname "$0")"
mkdir -p build
if command -v cmake >/dev/null 2>&1; then
  cmake -S . -B build -G Ninja >/dev/null 2>&1 || cmake -S . -B build >/dev/null
  cmake --build build --config Release
else
  g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
      -o build/libtileio.so tileio.cpp
fi
echo "built: $(ls build/libtileio.so)"
