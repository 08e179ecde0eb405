#!/bin/bash
# Round-5 critical path (VERDICT r4 items 1 + part of 2):
#   P fine-tune on REAL semantic features -> I-codec extension ->
#   eval-shape pre-warm -> flagship 96-frame protocol eval.
# Each leg logs its rc; artifacts commit only when the leg succeeded and
# the output is non-empty valid JSON (ADVICE r4 low 3).
set -u
cd /root/repo
R5=output/rd_round5
mkdir -p $R5 results
log() { echo "$1 $(date +%H:%M:%S)" >> $R5/campaign.log; }

# Leg 1: P-codec fine-tune conditioned on real frozen-student features
# (mse_640_mcft@1057 -> 2557; cascade band, mc_weight 0.2)
if [ ! -d $R5/mse_640/checkpoints/2557 ]; then
  timeout 7200 python main.py --synthetic --lambda-rd 640 --batch-size 4 --crop 256 \
    --log-root $R5 --run-name mse_640 \
    --stage-steps 100,200,300,400,500 --mc-weight-final 0.2 \
    --init-from output/rd_round4/mse_640_mcft \
    --semantic-root $R5 \
    --steps 2557 --ckpt-every 250 --val-every 500 \
    > $R5/leg_pft.log 2>&1
  log "P_FT rc=$?"
fi

# Leg 2: I-codec schedule extension 700 -> 3000 (cheap: 0.44 s/it)
if [ ! -d $R5/image_mse_640/checkpoints/3000 ]; then
  timeout 3600 python train_image.py --synthetic --lmbda 0.0483 --batch-size 8 --crop 256 \
    --log-root $R5 --steps 3000 --resume --ckpt-every 500 \
    > $R5/leg_iext.log 2>&1
  log "I_EXT rc=$?"
fi

# Leg 3: pre-warm every eval executable at the protocol shape (2 frames)
# so leg 4 is pure execution (r4's B_EVALFINAL640 died to compile cost)
timeout 3000 python test_video_tpu.py --synthetic --synthetic-size 448x832 --frames 2 \
  --checkpoint-root $R5 --lambdas 640 --metric mse \
  --output $R5/prewarm > $R5/leg_prewarm.log 2>&1
log "PREWARM rc=$?"

# Leg 4: flagship protocol eval — 96 frames, 448x832, GOP 12, real
# bitstreams, all three layers
timeout 2400 python test_video_tpu.py --synthetic --synthetic-size 448x832 --frames 96 \
  --checkpoint-root $R5 --lambdas 640 --metric mse \
  --output $R5/final > $R5/leg_final.log 2>&1
rc=$?
log "FINAL rc=$rc"
OUT=$R5/final/MSE/HEVC_D/HEVC_D_MSE_640.json
if [ $rc -eq 0 ] && [ -s $OUT ] && python -c "import json,sys; json.load(open('$OUT'))" 2>/dev/null; then
  cp $OUT results/rd_r5_640_final.json
  git add results/rd_r5_640_final.json
  git commit -q -m "r5 flagship: 3-layer protocol eval, 96 frames 448x832 GOP12 (results/rd_r5_640_final.json)" || true
  log "FINAL committed"
fi
