#!/bin/sh
# Build the native host-ops library. Invoked automatically on first import
# (data/native.py) when libhostops.so is missing.
set -e
cd "$(dirname "$0")"
CXX=${CXX:-c++}
$CXX -O3 -shared -fPIC -std=c++17 hostops.cpp -o libhostops.so
echo "built $(pwd)/libhostops.so"
