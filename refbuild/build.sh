#!/usr/bin/env bash
# Build the REFERENCE vechat_racon binary (HaploKit/vechat, /root/reference)
# offline for differential testing against vechat_tpu. The reference's
# CMake FetchContent deps (bioparser is in-tree under spoa; edlib and
# thread_pool are not) are satisfied with local shims under shims/ — see
# their headers for semantics. SISD spoa engine only (spoa's default; SIMD
# needs simde defines and is semantically identical per spoa's design).
#
# Output: refbuild/bin/vechat_racon
# Never writes into /root/reference.
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="$HERE/bin"
GEN="$HERE/gen"
mkdir -p "$OUT" "$GEN/src"

# version.hpp from version.hpp.in (values from the reference CMake project())
sed -e 's/@RACON_VERSION_MAJOR@/1/' \
    -e 's/@RACON_VERSION_MINOR@/5/' \
    -e 's/@RACON_VERSION_PATCH@/0/' \
    -e 's/@RACON_VERSION_COMMIT@/offline/' \
    "$REF/src/version.hpp.in" > "$GEN/src/version.hpp"

SPOA="$REF/vendor/spoa"
BIOPARSER="$SPOA/vendor/bioparser"

INCS=(
  -I "$HERE/shims"            # thread_pool/thread_pool.hpp
  -I "$HERE/shims/edlib"      # edlib.h
  -I "$GEN/src"               # version.hpp
  -I "$SPOA/include"
  -I "$SPOA/vendor/cereal/include"
  -I "$BIOPARSER/include"
  -I "$BIOPARSER/vendor/biosoup/include"
)

SRCS=(
  "$REF/src/main.cpp"
  "$REF/src/logger.cpp"
  "$REF/src/polisher.cpp"
  "$REF/src/overlap.cpp"
  "$REF/src/sequence.cpp"
  "$REF/src/window.cpp"
  "$SPOA/src/alignment_engine.cpp"
  "$SPOA/src/graph.cpp"
  "$SPOA/src/sisd_alignment_engine.cpp"
  "$SPOA/src/dispatcher.cpp"
  "$HERE/shims/edlib/edlib.cpp"
)

g++ -std=c++11 -O2 -DVERSION='"1.5.0-offline"' \
  "${INCS[@]}" "${SRCS[@]}" -lz -lpthread \
  -o "$OUT/vechat_racon"

echo "built $OUT/vechat_racon"
"$OUT/vechat_racon" --version
