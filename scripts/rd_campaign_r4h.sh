#!/bin/bash
# Round-4 campaign, take 3 (replaces r4g's tail after live step-rate
# measurements: band-1 ~3.9 s/step at batch 4, bands 2-5 0.4-1.5 s/step,
# I-codec ~1.1 s/step real — the logged s/it is async dispatch, not
# device time).  The r4g schedule (1400-step P points, 1500-step
# I-codecs, 4 rate points + every extra) cannot fit the clock, so:
#   - P640 (already in flight, 1400 steps) runs to completion: flagship
#     point, feeds bench + headline eval.
#   - P320/P160: 900 steps (bands 200..600 + 300 full-cascade steps).
#   - I-codecs: 700 steps.  Semantic stacks: 400 steps.
#   - lambda=80 dropped (3-point curve still gives monotonicity, BD-rate
#     overlap, and the >=1 dB spread check); 96-frame eval gated last.
#   - early 1-lambda eval kept: insurance smbpp>0 artifact + warms the
#     eval compile cache for the 3-point run.
# Priority when the clock bites (gates below): 3-pt eval + BD > semft
# eval > MS-SSIM point > bench/b2 > 96f.
# Usage: rd_campaign_r4h.sh <P640_PID_TO_WAIT_FOR> [DEADLINE_EPOCH]
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

DEADLINE=${2:-$(date -d '23:45' +%s)}
log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }  # minutes

if [ -n "$1" ] && [ "$1" != "0" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi
log H_P640_DONE 0

timeout 1500 python train_image.py --lmbda 0.0483 --steps 700 --synthetic \
  --batch-size 8 --log-root $OUT
log H_I640 $?
timeout 1500 python train_semantic_stack.py --lambda-rd 640 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log H_SEM640 $?

# insurance artifact: first-ever RD JSON with smbpp>0, cheap (13 frames)
timeout 2400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 640 --checkpoint-root $OUT --frames 13 \
  --output $OUT/eval_early
log H_EVALEARLY $?
cp $OUT/eval_early/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_early_640.json 2>/dev/null

timeout 2700 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 900 --stage-steps 200,300,400,500,600 --val-every 900 \
  --ckpt-every 450 --log-root $OUT
log H_P320 $?
timeout 1300 python train_image.py --lmbda 0.025 --steps 700 --synthetic \
  --batch-size 8 --log-root $OUT
log H_I320 $?
timeout 1000 python train_semantic_stack.py --lambda-rd 320 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log H_SEM320 $?

LAMBDAS="320 640"
if [ "$(left)" -gt 95 ]; then
  timeout 2700 python main.py --lambda-rd 160 --synthetic --batch-size 4 \
    --steps 900 --stage-steps 200,300,400,500,600 --val-every 900 \
    --ckpt-every 450 --log-root $OUT
  log H_P160 $?
  timeout 1300 python train_image.py --lmbda 0.013 --steps 700 --synthetic \
    --batch-size 8 --log-root $OUT
  log H_I160 $?
  timeout 1000 python train_semantic_stack.py --lambda-rd 160 --synthetic \
    --steps 400 --batch-size 2 --log-root $OUT
  log H_SEM160 $?
  LAMBDAS="320 640 160"
else
  log H_SKIP160 0
fi

# ---- multi-point eval (per-lambda JSONs land incrementally) ----------
timeout 3000 python test_video_tpu.py --synthetic --metric mse \
  --lambdas $LAMBDAS --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_4pt
log H_EVALNPT $?
cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_4pt_agg.json 2>/dev/null
for L in $LAMBDAS; do
  cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE_$L.json $RES/rd_r4_4pt_$L.json 2>/dev/null
done

python scripts/bd_between.py \
  --anchor results/rd_trained_synthetic_MSE.json \
  --test $RES/rd_r4_4pt_agg.json \
  --out $RES/bd_r4_vs_r3.json
log H_BDRATE $?

# ---- step-2 semantic fine-tune, stack STAGED this time (gated) -------
if [ "$(left)" -gt 55 ]; then
  timeout 1200 python train_semantic.py --lambda-rd 320 --synthetic \
    --checkpoint-root $OUT --steps 300 --batch-size 2 --log-root $OUT
  log H_SEMFT320 $?
  STAGE=$OUT/stage_semft320
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
  ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
  ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
  timeout 1200 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 --checkpoint-root $STAGE --frames 25 \
    --output $OUT/eval_semft
  log H_EVALSEMFT $?
  cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null
else
  log H_SKIPSEMFT 0
fi

# ---- one MS-SSIM-trained point (gated) --------------------------------
if [ "$(left)" -gt 50 ]; then
  timeout 1800 python main.py --lambda-rd 640 --metric msssim --synthetic \
    --batch-size 4 --steps 500 --stage-steps 120,200,280,360,440 \
    --val-every 500 --ckpt-every 250 --log-root $OUT
  log H_PMSSSIM640 $?
  timeout 1000 python train_image.py --lmbda 60.5 --metric msssim --tag 640 \
    --steps 500 --synthetic --batch-size 8 --log-root $OUT
  log H_IMSSSIM640 $?
  timeout 1200 python test_video_tpu.py --synthetic --metric msssim \
    --lambdas 640 --checkpoint-root $OUT --frames 25 \
    --output $OUT/eval_msssim
  log H_EVALMSSSIM $?
  cp $OUT/eval_msssim/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json $RES/rd_r4_msssim_640.json 2>/dev/null
else
  log H_SKIPMSSSIM 0
fi

# ---- bench with trained weights ---------------------------------------
timeout 1500 python bench.py --ckpt-root $OUT > $RES/bench_r4.json \
  2> $RES/bench_r4.err
log H_BENCH $?

if [ "$(left)" -gt 8 ]; then
  timeout 1000 python bench.py --ckpt-root $OUT --batch 2 \
    > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err
  log H_BENCH_B2 $?
else
  log H_SKIPBENCHB2 0
fi

# ---- 96-frame held-out eval, only if time remains ---------------------
if [ "$(left)" -gt 35 ]; then
  timeout 1800 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 640 --checkpoint-root $OUT --frames 96 \
    --synthetic-size 448x832 --synthetic-seed 1234 \
    --output $OUT/eval_96f
  log H_EVAL96F $?
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_96f_320.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_96f_agg.json 2>/dev/null
else
  log H_SKIP96F 0
fi

# checkpoints the driver bench needs must survive a machine rebuild
bash scripts/snapshot_artifacts.sh mse_640 image_mse_640 semantic_640
log H_SNAPSHOT $?

log CAMPAIGN_R4H_DONE 0
