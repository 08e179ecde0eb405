#!/bin/bash
# Round-4 campaign, retimed part B: the remaining MSE rate points on a
# compressed schedule (band graphs compile-cached from 640/320), the
# 4-point structure+texture sweep, and BD-rate vs the r3 curve.
set -x
cd /root/repo
OUT=output/rd_round4
RES=results

log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }

timeout 3200 python main.py --lambda-rd 160 --synthetic --batch-size 4 \
  --steps 1500 --stage-steps 200,300,400,500,600 --val-every 700 \
  --ckpt-every 500 --log-root $OUT
log PHASE11_P160 $?
timeout 1800 python train_image.py --lmbda 0.013 --steps 1500 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE12_I160 $?

timeout 3200 python main.py --lambda-rd 80 --synthetic --batch-size 4 \
  --steps 1500 --stage-steps 200,300,400,500,600 --val-every 700 \
  --ckpt-every 500 --log-root $OUT
log PHASE13_P80 $?
timeout 1800 python train_image.py --lmbda 0.0067 --steps 1500 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE14_I80 $?

# semantic stacks for the two new points (0.15 s/it measured at 640 —
# the graph is compile-cached, ~3 min each)
timeout 1200 python train_semantic_stack.py --lambda-rd 160 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log PHASE15_SEM160 $?
timeout 1200 python train_semantic_stack.py --lambda-rd 80 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log PHASE16_SEM80 $?

# 4-point sweep with semantic bits in-stream at every rate point (the
# reference protocol, test_video.py:219-265)
timeout 3600 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 80 160 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_4pt
log PHASE17_EVAL4PT $?
cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_4pt_agg.json 2>/dev/null
for L in 80 160 320 640; do
  cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE_$L.json $RES/rd_r4_4pt_$L.json 2>/dev/null
done

python scripts/bd_between.py \
  --anchor results/rd_trained_synthetic_MSE.json \
  --test $RES/rd_r4_4pt_agg.json \
  --out $RES/bd_r4_vs_r3.json
log PHASE18_BDRATE $?

log CAMPAIGN_PARTB_DONE 0
