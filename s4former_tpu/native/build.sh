#!/bin/bash
# Build the _s4_native C++ extension in place.
# Usage: s4former_tpu/native/build.sh  (or let native/__init__.py auto-build)
set -e
cd "$(dirname "$0")"
INC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
g++ -O3 -march=native -shared -fPIC -std=c++17 -Wall \
    -I"$INC" \
    src/s4_native.cpp \
    -ljpeg -lpng -lz \
    -o _s4_native.so
echo "built $(pwd)/_s4_native.so"
