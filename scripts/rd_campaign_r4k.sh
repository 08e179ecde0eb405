#!/bin/bash
# Round-4 campaign, session-3 tail. r4j got through P640/I640/SEM640
# training (checkpoints at output/rd_round4, snapshotted into artifacts/)
# and was killed at the start of the lambda-640 eval. This script resumes
# from there, REORDERED so the two highest-value proofs land first:
#   1. an RD artifact that codes semantic bits (smbpp>0) -- verdict #2
#   2. a trained-weights bench (fps, stall, i_bpp)       -- verdict #3/#7
# then the 320 chain, 2-pt eval + BD-rate, step-2 semantic fine-tune,
# one MS-SSIM point, b2 aggregate bench, 96-frame held-out eval.
# Results are git-committed after each phase (machine rebuilds wipe
# everything untracked -- this already killed this round once).
# Usage: rd_campaign_r4k.sh [DEADLINE_EPOCH]
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

DEADLINE=${1:?pass deadline epoch}
log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }  # minutes
commit_res() { git add results/ && git commit -q -m "$1" || true; }

# ---- 1. lambda-640 eval: first artifact with semantic bits --------------
timeout 2400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 640 --checkpoint-root $OUT --frames 13 \
  --output $OUT/eval_early
log K_EVAL640 $?
cp $OUT/eval_early/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_early_640.json 2>/dev/null
commit_res "RD artifact at lambda=640 with the trained semantic stack coding real bits"

# ---- 2. bench with trained weights --------------------------------------
timeout 1800 python bench.py --ckpt-root $OUT > $RES/bench_r4.json \
  2> $RES/bench_r4.err
log K_BENCH $?
commit_res "Trained-weights bench: fps/stall/i_bpp measured on the r4 lambda-640 checkpoints"

# ---- 3. 320 chain --------------------------------------------------------
timeout 2700 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 900 --stage-steps 200,300,400,500,600 --val-every 900 \
  --ckpt-every 300 --log-root $OUT
log K_P320 $?
timeout 1300 python train_image.py --lmbda 0.025 --steps 700 --synthetic \
  --batch-size 8 --log-root $OUT
log K_I320 $?
timeout 1000 python train_semantic_stack.py --lambda-rd 320 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log K_SEM320 $?

# ---- 4. 2-point eval + BD-rate -------------------------------------------
timeout 2400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_npt
log K_EVAL2PT $?
cp $OUT/eval_npt/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_2pt_agg.json 2>/dev/null
for L in 320 640; do
  cp $OUT/eval_npt/MSE/HEVC_D/HEVC_D_MSE_$L.json $RES/rd_r4_2pt_$L.json 2>/dev/null
done
python scripts/bd_between.py \
  --anchor results/rd_trained_synthetic_MSE.json \
  --test $RES/rd_r4_2pt_agg.json \
  --out $RES/bd_r4_vs_r3.json
log K_BDRATE $?
commit_res "2-point RD sweep (320/640) with semantic bits + BD-rate vs the r3 curve"

# ---- 5. step-2 semantic fine-tune, stack STAGED ---------------------------
if [ "$(left)" -gt 100 ]; then
  timeout 1200 python train_semantic.py --lambda-rd 320 --synthetic \
    --checkpoint-root $OUT --steps 300 --batch-size 2 --log-root $OUT
  log K_SEMFT320 $?
  STAGE=$OUT/stage_semft320
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
  ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
  ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
  timeout 1200 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 --checkpoint-root $STAGE --frames 25 \
    --output $OUT/eval_semft
  log K_EVALSEMFT $?
  cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null
  commit_res "Step-2 semantic fine-tune evaluated WITH the semantic stack staged"
else
  log K_SKIPSEMFT 0
fi

# ---- 6. one MS-SSIM-trained point -----------------------------------------
if [ "$(left)" -gt 75 ]; then
  timeout 1800 python main.py --lambda-rd 640 --metric msssim --synthetic \
    --batch-size 4 --steps 500 --stage-steps 120,200,280,360,440 \
    --val-every 500 --ckpt-every 250 --log-root $OUT
  log K_PMSSSIM640 $?
  timeout 1000 python train_image.py --lmbda 60.5 --metric msssim --tag 640 \
    --steps 500 --synthetic --batch-size 8 --log-root $OUT
  log K_IMSSSIM640 $?
  timeout 1200 python test_video_tpu.py --synthetic --metric msssim \
    --lambdas 640 --checkpoint-root $OUT --frames 25 \
    --output $OUT/eval_msssim
  log K_EVALMSSSIM $?
  cp $OUT/eval_msssim/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json $RES/rd_r4_msssim_640.json 2>/dev/null
  commit_res "First MS-SSIM-trained rate point (lambda=640) through forward_msssim"
else
  log K_SKIPMSSSIM 0
fi

# ---- 7. b2 aggregate bench -------------------------------------------------
if [ "$(left)" -gt 25 ]; then
  timeout 1000 python bench.py --ckpt-root $OUT --batch 2 \
    > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err
  log K_BENCH_B2 $?
  commit_res "batch_streams=2 aggregate bench after the decode working-set cuts"
else
  log K_SKIPBENCHB2 0
fi

# ---- 8. 96-frame held-out eval at 448x832 (gated) ---------------------------
if [ "$(left)" -gt 45 ]; then
  timeout 1800 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 640 --checkpoint-root $OUT --frames 96 \
    --synthetic-size 448x832 --synthetic-seed 1234 \
    --output $OUT/eval_96f
  log K_EVAL96F $?
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_96f_320.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_96f_agg.json 2>/dev/null
  commit_res "96-frame held-out 448x832 eval, GOP-12 I-refresh exercised 8x"
else
  log K_SKIP96F 0
fi

# ---- 9. snapshot the 320 checkpoints ----------------------------------------
bash scripts/snapshot_artifacts.sh mse_320 image_mse_320 semantic_320 \
  semantic_ft_mse_320
git add artifacts/ && git commit -q -m "Snapshot the lambda=320 checkpoint chain" || true
log K_SNAPSHOT $?

log CAMPAIGN_R4K_DONE 0
