#!/bin/bash
# Round-3 RD campaign continuation (r3l, replaces r3j).
#
# Same chain as r3j with one change: the combined 2-lambda trained and
# untrained curves are MERGED on CPU from the per-lambda aggregates
# (scripts/merge_rd.py) instead of re-running both evals on the chip —
# saves ~100 min of chip time so the semantic fine-tune (r3k) fits
# before round end.
#
#   1. wait for r3h's .ev640_done boundary, then stop r3h's process
#      group so its redundant FINAL stage doesn't burn the chip
#   2. resume P320 from step 400 through the cascade band (lambda is a
#      traced scalar, so P640's cached step graphs are reused)
#   3. re-run the lambda=320 trained eval + comparison
#   4. merge per-lambda aggregates -> 2-point curves + BD-rate (CPU)
#   5. pumped bench + per-stage table on the freed chip
#   6. log R3J_DONE (r3k's gate)
#
# Run fully detached: setsid nohup bash scripts/rd_campaign_r3l.sh > /tmp/r3l.out 2>&1 &
set -x
cd /root/repo
OUT=output/rd_round3
log() { echo "$1 $(date -u +%H:%M:%S)" >> $OUT/campaign.log; }
R3H_PGID=5707

# ---- 1. wait for the .ev640_done boundary, then stop r3h ----------------
while kill -0 $R3H_PGID 2>/dev/null && [ ! -f $OUT/.ev640_done ]; do sleep 60; done
if kill -0 $R3H_PGID 2>/dev/null; then
  sleep 5
  kill -TERM -- -$R3H_PGID 2>/dev/null
  sleep 10
  kill -KILL -- -$R3H_PGID 2>/dev/null
  log "R3H_STOPPED_AT_EV640"
fi
log R3L_START

# ---- 2. complete P320 through the cascade band ---------------------------
timeout 7200 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 2000 --stage-steps 400,600,800,1000,1200 --val-every 600 \
  --ckpt-every 200 --log-root $OUT --resume
log "P320_RESUME_DONE rc=$?"
cp -v $OUT/mse_320/train_*.log results/train_p320.log
cp -v $OUT/mse_320/summary/scalars.jsonl results/train_p320_scalars.jsonl

# ---- 3. re-eval lambda=320 against its untrained twin --------------------
timeout 4500 python test_video_tpu.py --synthetic --dataset synthetic \
  --metric mse --lambdas 320 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained_320_full
log "EVT320F_DONE rc=$?"
T=$OUT/eval_trained_320_full/MSE/synthetic/synthetic_MSE.json
U=$OUT/eval_untrained_320/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py --trained "$T" --untrained "$U" \
  --out $OUT/rd_comparison_320.json
log "CMP320F_DONE rc=$?"
cp -v "$T" results/rd_trained_320_synthetic_MSE.json
cp -v $OUT/rd_comparison_320.json results/

# ---- 4. merged 2-lambda curves + BD-rate (CPU only) -----------------------
TM=$OUT/eval_trained_merged.json
UM=$OUT/eval_untrained_merged.json
timeout 300 python scripts/merge_rd.py --out $TM \
  "$T" $OUT/eval_trained_640/MSE/synthetic/synthetic_MSE.json
timeout 300 python scripts/merge_rd.py --out $UM \
  "$U" $OUT/eval_untrained_640/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py --trained $TM --untrained $UM \
  --out $OUT/rd_comparison.json
log "CMP_DONE rc=$?"
cp -v $TM results/rd_trained_synthetic_MSE.json
cp -v $UM results/rd_untrained_synthetic_MSE.json
cp -v $OUT/rd_comparison.json results/rd_comparison.json

# ---- 5. perf: pumped bench + per-stage table on the freed chip ------------
timeout 3000 python bench.py > results/bench_r3_pumped.json 2>/tmp/bench_r3_pumped.err
log "BENCH_DONE rc=$?"
timeout 3000 python bench_stages.py > results/bench_stages_r3.txt 2>&1
log "STAGES_DONE rc=$?"
log R3J_DONE
log R3L_DONE
