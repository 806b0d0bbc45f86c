#!/bin/sh
# Build the native CPU oracle: native/liboracle.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -pthread -o liboracle.so oracle.cpp
echo "built $(pwd)/liboracle.so"
