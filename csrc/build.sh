#!/bin/sh
# Build the native I/O runtime. Invoked automatically (and cached) by
# navierstokes3d_tpu.io.native on first use; can also be run manually.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o libns3dio.so ns3dio.cpp
echo "built $(pwd)/libns3dio.so"
