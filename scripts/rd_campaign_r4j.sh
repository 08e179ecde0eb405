#!/bin/bash
# Round-4 campaign, resumed tail (r4i's I640 lost its whole timeout
# budget to a cold ~16-min XLA compile and could never have saved —
# train_image.py had no SIGTERM handler and ckpt_every=1000 > 700 steps.
# All trainer CLIs now checkpoint on SIGTERM, so timeout-clipped runs
# keep their steps; this script redoes I640 with that code and a wider
# bound, then continues exactly where r4i's plan left off.)
# Usage: rd_campaign_r4j.sh [DEADLINE_EPOCH]
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

DEADLINE=${1:-$(date -d '23:45' +%s)}
log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }  # minutes

timeout 1900 python train_image.py --lmbda 0.0483 --steps 700 --synthetic \
  --batch-size 8 --log-root $OUT
log J_I640 $?
timeout 1500 python train_semantic_stack.py --lambda-rd 640 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log J_SEM640 $?

timeout 2400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 640 --checkpoint-root $OUT --frames 13 \
  --output $OUT/eval_early
log J_EVALEARLY $?
cp $OUT/eval_early/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_early_640.json 2>/dev/null

timeout 2700 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 900 --stage-steps 200,300,400,500,600 --val-every 900 \
  --ckpt-every 450 --log-root $OUT
log J_P320 $?
timeout 1300 python train_image.py --lmbda 0.025 --steps 700 --synthetic \
  --batch-size 8 --log-root $OUT
log J_I320 $?
timeout 1000 python train_semantic_stack.py --lambda-rd 320 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log J_SEM320 $?

# ---- 2-point eval + BD-rate -------------------------------------------
timeout 2400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_npt
log J_EVAL2PT $?
cp $OUT/eval_npt/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_2pt_agg.json 2>/dev/null
for L in 320 640; do
  cp $OUT/eval_npt/MSE/HEVC_D/HEVC_D_MSE_$L.json $RES/rd_r4_2pt_$L.json 2>/dev/null
done
python scripts/bd_between.py \
  --anchor results/rd_trained_synthetic_MSE.json \
  --test $RES/rd_r4_2pt_agg.json \
  --out $RES/bd_r4_vs_r3.json
log J_BDRATE $?

# ---- step-2 semantic fine-tune, stack STAGED ---------------------------
if [ "$(left)" -gt 55 ]; then
  timeout 1200 python train_semantic.py --lambda-rd 320 --synthetic \
    --checkpoint-root $OUT --steps 300 --batch-size 2 --log-root $OUT
  log J_SEMFT320 $?
  STAGE=$OUT/stage_semft320
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
  ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
  ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
  timeout 1200 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 --checkpoint-root $STAGE --frames 25 \
    --output $OUT/eval_semft
  log J_EVALSEMFT $?
  cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null
else
  log J_SKIPSEMFT 0
fi

# ---- one MS-SSIM-trained point ------------------------------------------
if [ "$(left)" -gt 45 ]; then
  timeout 1800 python main.py --lambda-rd 640 --metric msssim --synthetic \
    --batch-size 4 --steps 500 --stage-steps 120,200,280,360,440 \
    --val-every 500 --ckpt-every 250 --log-root $OUT
  log J_PMSSSIM640 $?
  timeout 1000 python train_image.py --lmbda 60.5 --metric msssim --tag 640 \
    --steps 500 --synthetic --batch-size 8 --log-root $OUT
  log J_IMSSSIM640 $?
  timeout 1200 python test_video_tpu.py --synthetic --metric msssim \
    --lambdas 640 --checkpoint-root $OUT --frames 25 \
    --output $OUT/eval_msssim
  log J_EVALMSSSIM $?
  cp $OUT/eval_msssim/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json $RES/rd_r4_msssim_640.json 2>/dev/null
else
  log J_SKIPMSSSIM 0
fi

# ---- bench with trained weights -----------------------------------------
timeout 1500 python bench.py --ckpt-root $OUT > $RES/bench_r4.json \
  2> $RES/bench_r4.err
log J_BENCH $?
if [ "$(left)" -gt 8 ]; then
  timeout 1000 python bench.py --ckpt-root $OUT --batch 2 \
    > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err
  log J_BENCH_B2 $?
else
  log J_SKIPBENCHB2 0
fi

# ---- 96-frame held-out eval at 448x832 (gated) --------------------------
if [ "$(left)" -gt 35 ]; then
  timeout 1800 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 640 --checkpoint-root $OUT --frames 96 \
    --synthetic-size 448x832 --synthetic-seed 1234 \
    --output $OUT/eval_96f
  log J_EVAL96F $?
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_96f_320.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_96f_agg.json 2>/dev/null
else
  log J_SKIP96F 0
fi

# checkpoints the driver bench needs must survive a machine rebuild
bash scripts/snapshot_artifacts.sh mse_640 image_mse_640 semantic_640
log J_SNAPSHOT $?

log CAMPAIGN_R4J_DONE 0
