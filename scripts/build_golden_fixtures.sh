#!/bin/sh
# Build + run the reference-header golden-fixture emitter
# (native/golden_writer.cpp). Requires the reference checkout at
# /root/reference (read-only). The emitted fixtures are committed under
# tests/data/golden/ so the test suite never needs the reference tree.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REFERENCE_ROOT:-/root/reference}"
OUT="$REPO/tests/data/golden"
mkdir -p "$OUT"
g++ -std=c++11 -O1 -I"$REF/GSLAM" \
    "$REPO/native/golden_writer.cpp" -o /tmp/golden_writer -lpthread
/tmp/golden_writer "$OUT"
ls -la "$OUT"
