#!/bin/bash
# Bank config-#4 scale-run chunk checkpoints into the repo (gzipped) so the
# multi-session run survives the environment reset between build rounds.
# Restore before resuming:   scripts/restore_ckpt.sh
# Resume command: see BENCH_banked_r04.json .config4_full_scale.resume_cmd
set -e
SRC=${1:-/root/ckpt_c4}
DST=${2:-/root/repo/ckpt_c4_banked}
mkdir -p "$DST"
for f in "$SRC"/round*.rec; do
  [ -e "$f" ] || continue
  b=$(basename "$f")
  if [ ! -e "$DST/$b.gz" ] || [ "$f" -nt "$DST/$b.gz" ]; then
    gzip -c "$f" > "$DST/$b.gz.tmp" && mv "$DST/$b.gz.tmp" "$DST/$b.gz"
    echo "banked $b"
  fi
done
cp "$SRC"/run.log "$DST"/run.log 2>/dev/null || true
