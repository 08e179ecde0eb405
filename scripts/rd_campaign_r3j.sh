#!/bin/bash
# Round-3 RD campaign continuation (r3j, replaces r3i).
#
# Context: r3h (PID group 5707, still running) is working through
# EVU320 -> P640 -> I640 -> EV640 -> FINAL.  Its FINAL stage would spend
# ~1.5h on combined 2-lambda evals using the crippled step-400 lambda=320
# P model (that leg died at a transient tunnel error; main.py has since
# been hardened).  This script:
#   1. waits for r3h to reach the .ev640_done boundary (all per-lambda
#      artifacts committed by then), then stops r3h's process group so
#      FINAL's redundant evals don't burn the chip
#   2. resumes P320 from step 400 to 2000 through the cascade band
#   3. re-runs the lambda=320 trained eval + comparison
#   4. runs the combined 2-lambda trained+untrained evals + BD-rate
#   5. frees the chip and records the pumped bench + per-stage table
#
# Run fully detached: setsid nohup bash scripts/rd_campaign_r3j.sh > /tmp/r3j.out 2>&1 &
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
log R3J_START

# ---- 2. complete P320 through the cascade band ---------------------------
timeout 14000 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 2000 --stage-steps 400,600,800,1000,1200 --val-every 600 \
  --ckpt-every 200 --log-root $OUT --resume
log "P320_RESUME_DONE rc=$?"
cp -v $OUT/mse_320/train_*.log results/train_p320.log
cp -v $OUT/mse_320/summary/scalars.jsonl results/train_p320_scalars.jsonl

# ---- 3. re-eval lambda=320 against its untrained twin --------------------
timeout 6000 python test_video_tpu.py --synthetic --dataset synthetic \
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

# ---- 4. combined 2-lambda curves + BD-rate --------------------------------
timeout 9000 python test_video_tpu.py --synthetic --dataset synthetic \
  --metric mse --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained_full
log "EVALTF_DONE rc=$?"
if [ ! -f $OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json ]; then
  timeout 9000 python test_video_tpu.py --synthetic --dataset synthetic \
    --metric mse --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
    --output $OUT/eval_untrained
  log "EVALU_DONE rc=$?"
fi
T=$OUT/eval_trained_full/MSE/synthetic/synthetic_MSE.json
U=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py --trained "$T" --untrained "$U" \
  --out $OUT/rd_comparison.json
log "CMP_DONE rc=$?"
cp -v "$T" results/rd_trained_synthetic_MSE.json
cp -v "$U" results/rd_untrained_synthetic_MSE.json
cp -v $OUT/rd_comparison.json results/rd_comparison.json

# ---- 5. perf: pumped bench + per-stage table on the freed chip ------------
timeout 3000 python bench.py > results/bench_r3_pumped.json 2>/tmp/bench_r3_pumped.err
log "BENCH_DONE rc=$?"
timeout 3000 python bench_stages.py > results/bench_stages_r3.txt 2>&1
log "STAGES_DONE rc=$?"
log R3J_DONE
