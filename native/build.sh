#!/usr/bin/env bash
# Build the native host-kernel library.
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")"
g++ -O3 -std=c++17 -shared -fPIC -o libclassmate_native.so classmate_native.cpp
echo "built native/libclassmate_native.so"
