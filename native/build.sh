#!/bin/sh
# Build the native batch-assembly library. No external deps.
# Optional $1: output filename (the python binding loads a version-suffixed
# name, e.g. libbatch_ops.v2.so, so a rebuild is never dlopen-deduped
# against a stale in-process handle of the same path).
set -e
cd "$(dirname "$0")"
OUT="${1:-libbatch_ops.so}"
# compile to a per-process tmp name and rename atomically: concurrent
# first-use processes (runner.py launches one per chip) never dlopen a
# half-written artifact
TMP="$OUT.tmp.$$"
${CXX:-g++} -O3 -march=native -pthread -shared -fPIC -o "$TMP" batch_ops.cpp
mv -f "$TMP" "$OUT"
echo "built $(pwd)/$OUT"
