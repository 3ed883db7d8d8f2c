#!/bin/sh
# Build the native host kernel library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libparelag_kernels.so \
    parelag_kernels.cpp
echo "built $(pwd)/libparelag_kernels.so"
