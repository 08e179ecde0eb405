#!/bin/bash
# Round-3 RD proof campaign: train 2 P-codec rate points + 2 I-codec rate
# points on synthetic clips, then evaluate real-bitstream RD on the trained
# checkpoints (VERDICT.md round-2 items 1 and 8).
#
# Sequential: the box has ONE TPU chip; concurrent clients would fight over
# it. Each phase is timeout-bounded so a hang cannot eat the round.
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT

# Phase 1: P-codec lambda=640 (compressed stage schedule -> cascade at 1000)
timeout 11000 python main.py --lambda-rd 640 --synthetic --batch-size 4 \
  --steps 4000 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 1000 --log-root $OUT
echo "PHASE1_DONE rc=$?" >> $OUT/campaign.log

# Phase 2: I-codec lambda matching P-640 (tag image_mse_640)
timeout 7000 python train_image.py --lmbda 0.0483 --steps 2500 --synthetic \
  --batch-size 8 --log-root $OUT
echo "PHASE2_DONE rc=$?" >> $OUT/campaign.log

# Phase 3: P-codec lambda=320
timeout 11000 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 4000 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 1000 --log-root $OUT
echo "PHASE3_DONE rc=$?" >> $OUT/campaign.log

# Phase 4: I-codec lambda matching P-320 (tag image_mse_320)
timeout 7000 python train_image.py --lmbda 0.025 --steps 2500 --synthetic \
  --batch-size 8 --log-root $OUT
echo "PHASE4_DONE rc=$?" >> $OUT/campaign.log

# Phase 5: real-bitstream RD eval on the trained checkpoints
timeout 4000 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained
echo "PHASE5_DONE rc=$?" >> $OUT/campaign.log

# Phase 6: same eval with untrained weights (fresh init) for the
# trained-vs-untrained BD-rate comparison
timeout 4000 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
  --output $OUT/eval_untrained
echo "PHASE6_DONE rc=$?" >> $OUT/campaign.log
echo "CAMPAIGN_DONE" >> $OUT/campaign.log
