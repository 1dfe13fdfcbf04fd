#!/bin/bash
# Build the native batch-assembly library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread fastloader.cpp -o libfastloader.so
echo "built libfastloader.so"
