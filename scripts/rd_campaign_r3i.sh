#!/bin/bash
# Round-3 RD campaign continuation (r3i).
#
# r3h's P320 leg died at step 600/2000 from a transient axon-tunnel error
# during the first validation ("remote_compile: response body closed"),
# so the lambda=320 P model only has band-1 checkpoints (steps 200/400)
# and never reached the cascade band.  main.py has since been hardened
# (transient retry + non-fatal validation + checkpoint-before-validate).
#
# This script waits for the still-running r3h driver to finish its
# remaining legs (EV320, P640, I640, EV640, FINAL), then:
#   1. resumes P320 from step 400 to 2000 through the cascade band
#   2. re-runs the lambda=320 trained eval + comparison
#   3. re-runs the combined 2-lambda eval + BD-rate
#
# Run fully detached: setsid nohup bash scripts/rd_campaign_r3i.sh > /tmp/r3i.out 2>&1 &
set -x
cd /root/repo
OUT=output/rd_round3
log() { echo "$1 $(date -u +%H:%M:%S)" >> $OUT/campaign.log; }

# wait for the r3h driver (survives sessions; exits after FINAL)
while pgrep -x bash -a | grep -q rd_campaign_r3h.sh; do sleep 60; done
log R3I_START

# ---- 1. complete P320 through the cascade band --------------------------
timeout 14000 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 2000 --stage-steps 400,600,800,1000,1200 --val-every 600 \
  --ckpt-every 200 --log-root $OUT --resume
RC=$?; log "P320_RESUME_DONE rc=$RC"
cp -v $OUT/mse_320/train_*.log results/train_p320.log
cp -v $OUT/mse_320/summary/scalars.jsonl results/train_p320_scalars.jsonl

# only redo the evals if the training actually progressed
LATEST=$(ls $OUT/mse_320/checkpoints | sort -n | tail -1)
if [ "$LATEST" -gt 400 ]; then
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

  # combined 2-lambda trained curve + BD-rate against untrained
  timeout 9000 python test_video_tpu.py --synthetic --dataset synthetic \
    --metric mse --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
    --output $OUT/eval_trained_full
  log "EVALTF_DONE rc=$?"
  T=$OUT/eval_trained_full/MSE/synthetic/synthetic_MSE.json
  U=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
  timeout 600 python scripts/rd_compare.py --trained "$T" --untrained "$U" \
    --out $OUT/rd_comparison.json
  log "CMPF_DONE rc=$?"
  cp -v "$T" results/rd_trained_synthetic_MSE.json
  cp -v $OUT/rd_comparison.json results/rd_comparison.json
fi
log R3I_DONE
