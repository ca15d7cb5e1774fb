#!/bin/sh
# Build the native batch-assembly library. No external deps.
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -march=native -pthread -shared -fPIC -o libbatch_ops.so batch_ops.cpp
echo "built $(pwd)/libbatch_ops.so"
