#!/bin/bash
# Round-4 campaign, retimed part A (replaces rd_campaign_r4a.sh phases
# 3-9 after the wall-clock audit: ~6h remained at 11:00 with phases 1-2
# done).  Compressed schedules lean on the compile cache: the band/
# cascade graphs are lambda-traced and batch-shape-shared, so later
# rate points pay no recompile.
# $1: PID of the in-flight I640 training to wait for (0 = none).
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }

if [ -n "$1" ] && [ "$1" != "0" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
log WAIT_I640_DONE 0

timeout 2400 python train_semantic_stack.py --lambda-rd 640 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log PHASE3_SEM640 $?

timeout 5400 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 2200 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 700 --log-root $OUT
log PHASE4_P320 $?

timeout 2200 python train_image.py --lmbda 0.025 --steps 2000 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE5_I320 $?

timeout 2400 python train_semantic_stack.py --lambda-rd 320 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log PHASE6_SEM320 $?

timeout 2400 python train_semantic.py --lambda-rd 320 --synthetic \
  --checkpoint-root $OUT --steps 300 --batch-size 2 --log-root $OUT
log PHASE7_SEMFT320 $?

timeout 3600 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_3layer
log PHASE8_EVAL3L $?
cp $OUT/eval_3layer/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_3layer_320.json 2>/dev/null
cp $OUT/eval_3layer/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_3layer_640.json 2>/dev/null
cp $OUT/eval_3layer/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_3layer_agg.json 2>/dev/null

STAGE=$OUT/stage_semft320
mkdir -p $STAGE
ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
timeout 2400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 --checkpoint-root $STAGE --frames 25 \
  --output $OUT/eval_semft
log PHASE9_EVALSEMFT $?
cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null

log CAMPAIGN_PARTA_DONE 0
