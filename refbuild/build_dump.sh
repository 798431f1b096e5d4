#!/usr/bin/env bash
# Build the dump_state introspection harness against the reference sources
# with access-control disabled (-Dprivate=public -Dprotected=public) so
# internal pipeline state can be dumped for differential testing.
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="$HERE/bin"
GEN="$HERE/gen"
mkdir -p "$OUT" "$GEN/src"

sed -e 's/@RACON_VERSION_MAJOR@/1/' \
    -e 's/@RACON_VERSION_MINOR@/5/' \
    -e 's/@RACON_VERSION_PATCH@/0/' \
    -e 's/@RACON_VERSION_COMMIT@/offline/' \
    "$REF/src/version.hpp.in" > "$GEN/src/version.hpp"

SPOA="$REF/vendor/spoa"
BIOPARSER="$SPOA/vendor/bioparser"

INCS=(
  -I "$REF/src"
  -I "$HERE/shims"
  -I "$HERE/shims/edlib"
  -I "$GEN/src"
  -I "$SPOA/include"
  -I "$SPOA/vendor/cereal/include"
  -I "$BIOPARSER/include"
  -I "$BIOPARSER/vendor/biosoup/include"
)

SRCS=(
  "$HERE/dump_state.cpp"
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

g++ -std=c++11 -O2 -Dprivate=public -Dprotected=public \
  "${INCS[@]}" "${SRCS[@]}" -lz -lpthread \
  -o "$OUT/dump_state"

echo "built $OUT/dump_state"
