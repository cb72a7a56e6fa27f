#!/bin/sh
# One-liner build (reference lib/make.sh equivalent).
cd "$(dirname "$0")" && g++ -O3 -shared -fPIC -std=c++17 host_ops.cc -o libfrcnn_host_ops.so "$@"
