#!/bin/sh
# Build + run the reference-optimizer golden-fixture emitter
# (native/golden_ba_writer.cpp): compiles the reference's vendored
# Eigen-only g2o + optimizerG2O (GSLAM-DIYSLAM/src/zhaoyong/) and solves
# its own OptimizerTest simulations. Emitted fixtures are committed
# under tests/data/golden/ so the suite never needs the reference tree.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${REFERENCE_ROOT:-/root/reference}"
OPT="$REF/GSLAM-DIYSLAM/src/zhaoyong/optimizerG2O"
OUT="$REPO/tests/data/golden"
mkdir -p "$OUT"
g++ -std=c++11 -O2 -w -I"$OPT" -I"$REF/GSLAM" -I"$REF/cmake/eigen3" \
    "$REPO/native/golden_ba_writer.cpp" "$OPT/Optimizer.cpp" \
    "$OPT"/g2o/core/*.cpp "$OPT"/g2o/stuff/*.cpp \
    -o /tmp/golden_ba_writer -lpthread
/tmp/golden_ba_writer "$OUT"
ls -la "$OUT"
