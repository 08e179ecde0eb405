#!/bin/bash
# Round-3 campaign tail (r3k): semantic-layer fine-tune proof.
#
# Runs AFTER r3j frees the chip (gated on the R3J_DONE marker in
# campaign.log).  Reference parity: step-2 training
# (Trainer_ICIP2020ResB_WSM_PSNRv2, /root/reference/main.py:17) fine-tunes
# the P-frame codec WITH the frozen semantic stack in the loop, starting
# at the stage-5 boundary.  This produces the first committed artifact of
# that path actually training on hardware:
#   1. train_semantic.py from the lambda=320 step-1 weights + trained
#      I-codec (output/rd_round3 layout) for 250 steps
#   2. eval the fine-tuned P weights through the real-bitstream harness
#      (staging root: symlink semantic_ft checkpoints as the P run)
#   3. copy logs/scalars/eval JSON into results/
#
# Run fully detached: setsid nohup bash scripts/rd_campaign_r3k.sh > /tmp/r3k.out 2>&1 &
set -x
cd /root/repo
OUT=output/rd_round3
log() { echo "$1 $(date -u +%H:%M:%S)" >> $OUT/campaign.log; }

# ---- gate on r3j completion ----------------------------------------------
while ! grep -q R3J_DONE $OUT/campaign.log 2>/dev/null; do sleep 60; done
log R3K_START

# ---- 1. semantic fine-tune (reference step 2) -----------------------------
timeout 5400 python train_semantic.py --lambda-rd 320 --metric mse \
  --synthetic --batch-size 2 --crop 256 --frames 5 --steps 150 \
  --ckpt-every 75 --checkpoint-root $OUT --log-root $OUT
log "SEMFT_DONE rc=$?"
cp -v $OUT/semantic_ft_mse_320/train_*.log results/train_semft320.log
cp -v $OUT/semantic_ft_mse_320/summary/scalars.jsonl \
  results/train_semft320_scalars.jsonl 2>/dev/null

# ---- 2. eval the fine-tuned P codec through the bitstream harness ---------
STAGE=$OUT/semft_stage
rm -rf $STAGE; mkdir -p $STAGE
ln -s ../semantic_ft_mse_320 $STAGE/mse_320
ln -s ../image_mse_320 $STAGE/image_mse_320
timeout 4500 python test_video_tpu.py --synthetic --dataset synthetic \
  --metric mse --lambdas 320 --checkpoint-root $STAGE --frames 13 \
  --output $OUT/eval_semft_320
log "EVSEMFT_DONE rc=$?"
cp -v $OUT/eval_semft_320/MSE/synthetic/synthetic_MSE.json \
  results/rd_semft_320_synthetic_MSE.json
log R3K_DONE
