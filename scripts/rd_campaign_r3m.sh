#!/bin/bash
# Round-3 campaign (r3m): cascade-band completion for the lambda=320
# rate point + re-eval.
#
# P640 trained 400 cascade-band steps (to 1600) before its timeout;
# P320's resume died at exactly 1200 — the cascade boundary — so its
# eval point has ZERO cascade training and the 2-lambda curve may be
# degenerate.  This leg resumes P320 through the cascade band, re-runs
# the real-bitstream eval, and refreshes the merged curves + comparison.
#
# GATE env var picks the campaign.log marker to wait for (default
# R3J_DONE = after r3l's bench; set GATE=R3K_DONE to run after the
# semantic fine-tune instead).
#
# Run fully detached: setsid nohup bash scripts/rd_campaign_r3m.sh > /tmp/r3m.out 2>&1 &
set -x
cd /root/repo
OUT=output/rd_round3
GATE=${GATE:-R3J_DONE}
log() { echo "$1 $(date -u +%H:%M:%S)" >> $OUT/campaign.log; }

while ! grep -q "$GATE" $OUT/campaign.log 2>/dev/null; do sleep 60; done
log R3M_START

# ---- 1. P320 through the cascade band (resume from step 1200) ------------
timeout 5400 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 2000 --stage-steps 400,600,800,1000,1200 --val-every 400 \
  --ckpt-every 200 --log-root $OUT --resume
log "P320_CASCADE_DONE rc=$?"
cat $OUT/mse_320/train_*.log > results/train_p320.log
cp -v $OUT/mse_320/summary/scalars.jsonl results/train_p320_scalars.jsonl

# ---- 2. re-eval + comparison ----------------------------------------------
timeout 4500 python test_video_tpu.py --synthetic --dataset synthetic \
  --metric mse --lambdas 320 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained_320_v2
log "EVT320V2_DONE rc=$?"
T=$OUT/eval_trained_320_v2/MSE/synthetic/synthetic_MSE.json
U=$OUT/eval_untrained_320/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py --trained "$T" --untrained "$U" \
  --out $OUT/rd_comparison_320.json
log "CMP320V2_DONE rc=$?"
cp -v "$T" results/rd_trained_320_synthetic_MSE.json
cp -v $OUT/rd_comparison_320.json results/

# ---- 3. refresh merged 2-lambda curves (CPU) -------------------------------
TM=$OUT/eval_trained_merged.json
UM=$OUT/eval_untrained_merged.json
timeout 300 python scripts/merge_rd.py --out $TM \
  "$T" $OUT/eval_trained_640/MSE/synthetic/synthetic_MSE.json
timeout 300 python scripts/merge_rd.py --out $UM \
  $OUT/eval_untrained_320/MSE/synthetic/synthetic_MSE.json \
  $OUT/eval_untrained_640/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py --trained $TM --untrained $UM \
  --out $OUT/rd_comparison.json
log "CMPV2_DONE rc=$?"
cp -v $TM results/rd_trained_synthetic_MSE.json
cp -v $UM results/rd_untrained_synthetic_MSE.json
cp -v $OUT/rd_comparison.json results/rd_comparison.json
log R3M_DONE
