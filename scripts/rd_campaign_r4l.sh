#!/bin/bash
# Round-4 follow-up: runs AFTER rd_campaign_r4j.sh finishes (its 23:45
# deadline makes it skip the gated extras).  Idempotent: each job is
# skipped if its results artifact already exists, so it only fills the
# gaps r4j left.
#
# Leg 1 is the full reference pipeline at lambda=640, chained:
#   (a) MC fine-tune: short cascade-band run with mc_loss weight 0.2
#       (reference v2's 0.01 never pulls MC above plain warping on
#       compressed schedules; rd_r4_early_640 showed mcpsnr 14.7 <
#       warppsnr 23.5)
#   (b) step-2 semantic fine-tune from the MC-ft weights (Learner.py:661-698
#       semantics): the step-1 P-codec was trained with ZEROED semantic
#       features, so evaluating it with real ones is a distribution
#       mismatch (rd_r4_early_640 psnr 21.6 vs the no-semantic 24.4)
#   (c) eval with the full stack staged -> the round's flagship artifact.
# Usage: rd_campaign_r4l.sh [DEADLINE_EPOCH]
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

DEADLINE=${1:?pass deadline epoch}
log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }  # minutes
commit_res() { git add results/ && git commit -q -m "$1" || true; }

# r4j re-tars the 640 snapshots at its end; identical content, new gzip
# mtimes -> git would see 1.2 GB of "changes".  Drop them before any add.
git restore artifacts/ 2>/dev/null || git checkout -- artifacts/ 2>/dev/null || true

# commit whatever r4j produced but never committed
commit_res "r4j campaign results: 2-pt sweep, BD-rate, trained-weights bench"

# ---- 1a. MC fine-tune at lambda=640 -----------------------------------------
if [ ! -f $RES/rd_r4_640_final.json ] && [ "$(left)" -gt 50 ]; then
  timeout 1500 python main.py --lambda-rd 640 --synthetic --batch-size 4 \
    --steps 1000 --stage-steps 200,300,400,500,600 --val-every 2000 \
    --ckpt-every 300 --log-root $OUT \
    --init-from $OUT/mse_640 --run-name mse_640_mcft --mc-weight-final 0.2
  log L_MCFT640 $?
  STAGE=$OUT/stage_mcft640
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/mse_640_mcft $STAGE/mse_640
  ln -sfn $(pwd)/$OUT/image_mse_640 $STAGE/image_mse_640
  ln -sfn $(pwd)/$OUT/semantic_640 $STAGE/semantic_640

  # quick intermediate eval (13 frames): MC-vs-warp check in isolation
  timeout 1000 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 640 --checkpoint-root $STAGE --frames 13 \
    --output $OUT/eval_mcft
  log L_EVALMCFT $?
  cp $OUT/eval_mcft/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_mcft_640.json 2>/dev/null
  commit_res "MC fine-tune (mc_weight 0.2, 300 steps): motion compensation vs warp PSNR re-measured"
fi

# ---- 1b. step-2 semantic fine-tune at 640 from the MC-ft weights --------------
if [ ! -f $RES/rd_r4_640_final.json ] && [ "$(left)" -gt 40 ] \
   && [ -d $OUT/mse_640_mcft/checkpoints ]; then
  timeout 1500 python train_semantic.py --lambda-rd 640 --synthetic \
    --checkpoint-root $OUT/stage_mcft640 --steps 300 --batch-size 2 \
    --log-root $OUT
  log L_SEMFT640 $?
  STAGE=$OUT/stage_final640
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/semantic_ft_mse_640 $STAGE/mse_640
  ln -sfn $(pwd)/$OUT/image_mse_640 $STAGE/image_mse_640
  ln -sfn $(pwd)/$OUT/semantic_640 $STAGE/semantic_640
  timeout 1200 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 640 --checkpoint-root $STAGE --frames 25 \
    --output $OUT/eval_final640
  log L_EVALFINAL640 $?
  cp $OUT/eval_final640/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_640_final.json 2>/dev/null
  commit_res "Flagship lambda=640 artifact: MC-ft + step-2 semantic fine-tune, full stack staged"
fi

# ---- 2. no-semantic 2-pt eval: the apples-to-apples BD-rate vs r3 ------------
# r4j's J_BDRATE compares a semantic-staged curve (more bits + step-1
# weights seeing real features they were never trained on) against r3's
# no-semantic curve; this leg evals the same 2 points with --no-semantic
# so the BD-rate isolates what training depth bought on an equal footing.
if [ ! -f $RES/bd_r4_vs_r3_nosem.json ] && [ "$(left)" -gt 55 ]; then
  timeout 1800 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 640 --checkpoint-root $OUT --frames 25 --no-semantic \
    --output $OUT/eval_nosem
  log L_EVALNOSEM $?
  cp $OUT/eval_nosem/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_nosem_agg.json 2>/dev/null
  python scripts/bd_between.py \
    --anchor results/rd_trained_synthetic_MSE.json \
    --test $RES/rd_r4_nosem_agg.json \
    --out $RES/bd_r4_vs_r3_nosem.json
  log L_BDNOSEM $?
  commit_res "No-semantic 2-pt eval: apples-to-apples BD-rate vs the r3 curve"
fi

# ---- 3. b2 aggregate bench (if r4j skipped) -----------------------------------
if [ ! -f $RES/bench_r4_b2.json ] && [ "$(left)" -gt 35 ]; then
  timeout 1000 python bench.py --ckpt-root $OUT --batch 2 \
    > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err
  log L_BENCH_B2 $?
  commit_res "batch_streams=2 aggregate bench after the decode working-set cuts"
fi

# ---- 4. 96-frame held-out eval at 448x832 --------------------------------------
if [ ! -f $RES/rd_r4_96f_agg.json ] && [ "$(left)" -gt 30 ]; then
  timeout 1500 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 640 --checkpoint-root $OUT --frames 96 \
    --synthetic-size 448x832 --synthetic-seed 1234 \
    --output $OUT/eval_96f
  log L_EVAL96F $?
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_96f_320.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_96f_agg.json 2>/dev/null
  commit_res "96-frame held-out 448x832 eval, GOP-12 I-refresh exercised 8x"
fi

# ---- 6. step-2 (lowest priority: the 640 chain already proves step-2) semantic fine-tune at 320 (if r4j skipped) --------------------
if [ ! -f $RES/rd_r4_semft_320.json ] && [ "$(left)" -gt 45 ]; then
  timeout 1200 python train_semantic.py --lambda-rd 320 --synthetic \
    --checkpoint-root $OUT --steps 300 --batch-size 2 --log-root $OUT
  log L_SEMFT320 $?
  STAGE=$OUT/stage_semft320
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
  ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
  ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
  timeout 1200 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 --checkpoint-root $STAGE --frames 25 \
    --output $OUT/eval_semft
  log L_EVALSEMFT $?
  cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null
  commit_res "Step-2 semantic fine-tune at 320 evaluated WITH the semantic stack staged"
fi

# ---- 7. one MS-SSIM-trained point (if r4j skipped) ---------------------------
if [ ! -f $RES/rd_r4_msssim_640.json ] && [ "$(left)" -gt 70 ]; then
  timeout 1800 python main.py --lambda-rd 640 --metric msssim --synthetic \
    --batch-size 4 --steps 500 --stage-steps 120,200,280,360,440 \
    --val-every 500 --ckpt-every 250 --log-root $OUT
  log L_PMSSSIM640 $?
  timeout 1000 python train_image.py --lmbda 60.5 --metric msssim --tag 640 \
    --steps 500 --synthetic --batch-size 8 --log-root $OUT
  log L_IMSSSIM640 $?
  timeout 1200 python test_video_tpu.py --synthetic --metric msssim \
    --lambdas 640 --checkpoint-root $OUT --frames 25 \
    --output $OUT/eval_msssim
  log L_EVALMSSSIM $?
  cp $OUT/eval_msssim/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json $RES/rd_r4_msssim_640.json 2>/dev/null
  commit_res "First MS-SSIM-trained rate point (lambda=640) through forward_msssim"
fi

# ---- 6. snapshot new checkpoints -------------------------------------------------
# Only the P-codecs: they are the expensive-to-retrain piece (~45 min each);
# I-codecs/semantic stacks rebuild in <10 min and bench only needs the 640
# trio, which is already committed.
git restore artifacts/ 2>/dev/null || true
bash scripts/snapshot_artifacts.sh mse_320 semantic_ft_mse_640
git add artifacts/ && git commit -q -m "Snapshot the lambda=320 and final fine-tuned 640 P-codec checkpoints" || true
log L_SNAPSHOT $?

log CAMPAIGN_R4L_DONE 0
