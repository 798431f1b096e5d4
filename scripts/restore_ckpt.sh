#!/bin/bash
# Restore banked config-#4 checkpoints into the live resume dir.
set -e
SRC=${1:-/root/repo/ckpt_c4_banked}
DST=${2:-/root/ckpt_c4}
mkdir -p "$DST"
for f in "$SRC"/round*.rec.gz; do
  [ -e "$f" ] || continue
  b=$(basename "$f" .gz)
  [ -e "$DST/$b" ] || gunzip -c "$f" > "$DST/$b"
done
echo "restored $(ls "$DST" | grep -c '\.rec$') chunks into $DST"
