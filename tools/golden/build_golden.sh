#!/bin/bash
# Build the golden-trajectory generator against the reference's headless
# dynamics core. Eigen comes from the TensorFlow wheel's bundled headers.
# Usage: tools/golden/build_golden.sh [outdir]
set -euo pipefail

REF=/root/reference
EIGEN=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=${TMPDIR:-/tmp}/golden_build
OUT=${1:-$HERE/../../tests/data}

mkdir -p "$BUILD" "$OUT"

SRCS=(
  "$REF/eggshell/ensembles.cc"
  "$REF/eggshell/lcp.cc"
  "$REF/toolkit/lcp.cc"
  "$REF/eggshell/collision.cc"
  "$REF/eggshell/utils.cc"
  "$REF/eggshell/body.cc"
  "$REF/eggshell/contact.cc"
  "$REF/eggshell/joints.cc"
  "$REF/eggshell/sparse_iterations.cc"
  "$REF/eggshell/sparse_iterations_utils.cc"
  "$REF/toolkit/error.cc"
  "$REF/toolkit/random.cc"
  "$REF/toolkit/testing.cc"
  "$HERE/stubs.cc"
  "$HERE/gen_golden.cc"
)

# EIGEN_NO_DEBUG: the reference constructs VectorXd(0, 0) placeholders
# (ensembles.cc:157) that newer Eigen's debug assertions reject; released
# builds of the reference run with assertions compiled out.
g++ -O2 -std=c++17 -w -DNDEBUG -DEIGEN_NO_DEBUG \
  -DTOOLKIT_LCP_H="\"$REF/toolkit/lcp.h\"" \
  -include "$HERE/now_decl.h" \
  -I"$REF/eggshell" -I"$REF/toolkit" -I"$EIGEN" \
  "${SRCS[@]}" -o "$BUILD/gen_golden"

"$BUILD/gen_golden" "$OUT"
