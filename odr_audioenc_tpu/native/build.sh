#!/bin/sh
# Build the native host library (C++ packers). Run from anywhere.
cd "$(dirname "$0")"
exec g++ -O2 -fPIC -shared -fopenmp -o libodrhost.so mp2pack.cpp dabpack.cpp
