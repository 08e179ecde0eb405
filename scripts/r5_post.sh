#!/bin/bash
# Round-5 post-critical chain: snapshot the MC-fine-tuned trio (rebuild
# survival), warm the bench's compile cache + record serial/b2 numbers
# with the r5 checkpoints, then run the extras campaign (rate points,
# BD-rate, MS-SSIM, slice A/B, ablation).  Run AFTER scripts/r5_critical.sh.
set -u
cd /root/repo
R5=output/rd_round5
mkdir -p $R5 results
log() { echo "$1 $(date +%H:%M:%S)" >> $R5/campaign.log; }

# ---- snapshot the fine-tuned trio: only committed files survive rebuilds ----
SNAP_ROOT=$R5 bash scripts/snapshot_artifacts.sh mse_640 image_mse_640 semantic_640
git add artifacts && git commit -q -m "r5: checkpoint snapshots after MC fine-tune (rebuild survival)" || true
log "SNAPSHOT1 done"

# ---- bench with the fine-tuned checkpoints (also warms /tmp/jax_cache
# for the driver's end-of-round run; r4's b2 leg died to cold compile) ----
timeout 3000 python bench.py > results/bench_r5.json 2> $R5/leg_bench.err
rc=$?
log "BENCH rc=$rc"
if [ $rc -eq 0 ] && python -c "import json;json.load(open('results/bench_r5.json'))" 2>/dev/null; then
  git add results/bench_r5.json && git commit -q -m \
    "r5: 1080p bench with MC-fine-tuned checkpoints (serial + pipelined + GOP legs)" || true
fi

timeout 2400 python bench.py --batch 2 --no-iframe > results/bench_r5_b2.json 2> $R5/leg_bench_b2.err
rc=$?
log "BENCH_B2 rc=$rc"
if [ $rc -eq 0 ] && python -c "import json;json.load(open('results/bench_r5_b2.json'))" 2>/dev/null; then
  git add results/bench_r5_b2.json && git commit -q -m \
    "r5: batch_streams=2 aggregate throughput (VERDICT r4 missing #7)" || true
fi

# ---- extras: rate points, curve+BD, ablation, MS-SSIM, slice A/B ----
bash scripts/r5_extras.sh
log "EXTRAS done"
