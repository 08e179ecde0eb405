#!/bin/bash
# Round-4 RD campaign, part 2 (after rd_campaign_r4a.sh): 96-frame
# held-out eval, the remaining two MSE rate points (160, 80) + their
# semantic stacks, the full 4-point sweep + BD-rate vs the r3 curve, and
# one MS-SSIM-trained point (VERDICT r3 items 3, 4, 8).
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }

# ---- 96-frame held-out eval at 448x832, GOP 12 (8 I-refreshes) -------
# seed 1234 != the trainers' 16: held-out sequences, larger resolution
timeout 5400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 96 \
  --synthetic-size 448x832 --synthetic-seed 1234 \
  --output $OUT/eval_96f
log PHASE10_EVAL96F $?
cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_96f_320.json 2>/dev/null
cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_96f_agg.json 2>/dev/null

# ---- remaining MSE rate points ---------------------------------------
timeout 6200 python main.py --lambda-rd 160 --synthetic --batch-size 4 \
  --steps 2800 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 800 --log-root $OUT
log PHASE11_P160 $?
timeout 2800 python train_image.py --lmbda 0.013 --steps 2500 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE12_I160 $?

timeout 6200 python main.py --lambda-rd 80 --synthetic --batch-size 4 \
  --steps 2800 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 800 --log-root $OUT
log PHASE13_P80 $?
timeout 2800 python train_image.py --lmbda 0.0067 --steps 2500 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE14_I80 $?

timeout 2400 python train_semantic_stack.py --lambda-rd 160 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log PHASE15_SEM160 $?
timeout 2400 python train_semantic_stack.py --lambda-rd 80 --synthetic \
  --steps 400 --batch-size 2 --log-root $OUT
log PHASE16_SEM80 $?

# ---- the full 4-point sweep, semantic bits in-stream ------------------
timeout 5400 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 80 160 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_4pt
log PHASE17_EVAL4PT $?
cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_4pt_agg.json 2>/dev/null
for L in 80 160 320 640; do
  cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE_$L.json $RES/rd_r4_4pt_$L.json 2>/dev/null
done

# BD-rate of the r4 4-point curve vs the r3 2-point curve (first
# committed BD number between own runs, VERDICT r3 item 4)
python scripts/bd_between.py \
  --anchor results/rd_trained_synthetic_MSE.json \
  --test $RES/rd_r4_4pt_agg.json \
  --out $RES/bd_r4_vs_r3.json
log PHASE18_BDRATE $?

# ---- one MS-SSIM-trained point (lambda 320 -> l_msssim 6.4) -----------
timeout 5400 python main.py --lambda-rd 320 --metric msssim --synthetic \
  --batch-size 4 --steps 2400 --stage-steps 400,600,800,1000,1200 \
  --val-every 1000 --ckpt-every 800 --log-root $OUT
log PHASE19_PMSSSIM $?
timeout 2800 python train_image.py --lmbda 31.73 --metric msssim --tag 320 \
  --steps 2200 --synthetic --batch-size 8 --log-root $OUT
log PHASE20_IMSSSIM $?
timeout 3000 python test_video_tpu.py --synthetic --metric msssim \
  --lambdas 320 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_msssim
log PHASE21_EVALMSSSIM $?
cp $OUT/eval_msssim/MSSSIM/HEVC_D/HEVC_D_MSSSIM_320.json $RES/rd_r4_msssim_320.json 2>/dev/null

log CAMPAIGN_PART2_DONE 0
