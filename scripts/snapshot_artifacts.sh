#!/bin/bash
# Archive trained checkpoint run-dirs into the git-tracked artifacts/ dir.
# Rationale: only committed files survive a machine rebuild between builder
# sessions — output/ (gitignored) was wiped mid-round-4, losing every
# trained checkpoint.  bench.py auto-restores these tarballs when the live
# dirs are absent (_restore_artifact_snapshots), so the driver's
# end-of-round bench still measures trained weights.
# Usage: snapshot_artifacts.sh <run-dir-name>...
#   SNAP_ROOT=output/rd_round5 (default) selects the round dir.
set -e
cd /root/repo
ROOT="${SNAP_ROOT:-output/rd_round5}"
mkdir -p artifacts
for name in "$@"; do
  if [ -d "$ROOT/$name" ]; then
    tar czf "artifacts/$name.tar.gz" -C "$ROOT" "$name"
    du -h "artifacts/$name.tar.gz"
  else
    echo "skip $name (no such run dir under $ROOT)" >&2
  fi
done
