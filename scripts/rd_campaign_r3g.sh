#!/bin/bash
# Round-3 RD campaign, fresh-start driver (r3g).
#
# The r3a-r3f campaign trained into output/ on the previous VM; a host
# restart wiped output/ and /tmp/jax_cache, so nothing survived.  This
# driver restarts from scratch with the microbatched cascade band
# (trainer.py: lax.scan over the batch axis, B=1 per iteration) that
# fixed the 35.7GB-vs-15.75GB OOM, and copies every durable artifact
# into results/ as soon as it exists so an interrupted run still leaves
# committed evidence.
#
# Phases (markers appended to $OUT/campaign.log):
#   P320  — P-frame staged training, lambda=320, 1200 cascade steps
#   P640  — same at lambda=640
#   I320/I640 — I-codec training at the mapped i_lambda values
#   EVALT — trained real-bitstream eval (both lambdas)
#   EVALU — untrained (fresh-init) eval for the BD-rate comparison
#   CMP   — scripts/rd_compare.py BD-rate between the two
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT results
log() { echo "$1 $(date -u +%H:%M:%S)" >> $OUT/campaign.log; }

log R3G_START

for LAM in 320 640; do
  timeout 14000 python main.py --lambda-rd $LAM --synthetic --batch-size 4 \
    --steps 2400 --stage-steps 400,600,800,1000,1200 --val-every 600 \
    --ckpt-every 400 --log-root $OUT
  log "P${LAM}_DONE rc=$?"
  cp -v $OUT/mse_${LAM}/train_*.log results/train_p${LAM}.log 2>/dev/null
done

# I-codec legs (RATE_POINTS i_lambda_mse for p-lambda 320 / 640)
timeout 5000 python train_image.py --lmbda 0.025 --tag 320 --synthetic \
  --steps 2000 --batch-size 8 --log-root $OUT
log "I320_DONE rc=$?"
timeout 5000 python train_image.py --lmbda 0.0483 --tag 640 --synthetic \
  --steps 2000 --batch-size 8 --log-root $OUT
log "I640_DONE rc=$?"

# trained eval (real rANS bitstreams, trained P + trained I checkpoints)
timeout 6000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained
log "EVALT_DONE rc=$?"

# untrained eval (fresh init) for the BD-rate comparison
timeout 6000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
  --output $OUT/eval_untrained
log "EVALU_DONE rc=$?"

TRAINED_JSON=$OUT/eval_trained/MSE/synthetic/synthetic_MSE.json
UNTRAINED_JSON=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py \
  --trained "$TRAINED_JSON" --untrained "$UNTRAINED_JSON" \
  --out $OUT/rd_comparison.json
log "CMP_DONE rc=$?"

cp -v "$TRAINED_JSON" results/rd_trained_synthetic_MSE.json
cp -v "$UNTRAINED_JSON" results/rd_untrained_synthetic_MSE.json
cp -v $OUT/rd_comparison.json results/rd_comparison.json
for LAM in 320 640; do
  cp -v $OUT/mse_${LAM}/summary/scalars.jsonl results/train_p${LAM}_scalars.jsonl 2>/dev/null
  cp -v $OUT/image_mse_${LAM}/train_*.log results/train_i${LAM}.log 2>/dev/null
done
log R3G_DONE
