#!/bin/sh
# Build the native host-runtime library. Output lands next to the sources;
# the python wrapper (ed3dgs_tpu/data/native_staging.py) looks here first and
# falls back to the PIL path if the .so is absent.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 staging.cpp -o libed3dgs_staging.so -lpng -lpthread
echo "built $(pwd)/libed3dgs_staging.so"
