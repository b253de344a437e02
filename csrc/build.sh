#!/bin/sh
# Build the native runtime pieces into lightx2v_tpu/_native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../lightx2v_tpu/_native
g++ -O3 -fPIC -shared -std=c++17 -pthread \
    safetensors_reader.cpp -o ../lightx2v_tpu/_native/libsafetensors_reader.so
echo "built lightx2v_tpu/_native/libsafetensors_reader.so"
