#!/bin/bash
# Build the native helpers (C++): libsasort.so
set -euo pipefail
cd "$(dirname "$0")/../native"
g++ -O3 -march=native -fPIC -shared -fopenmp sa_sort.cpp -o libsasort.so
echo "built native/libsasort.so"
