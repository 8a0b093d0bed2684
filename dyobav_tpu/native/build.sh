#!/bin/sh
# Build the native map-compiler shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -o libmapcompiler.so map_compiler.cpp
echo "built $(pwd)/libmapcompiler.so"
