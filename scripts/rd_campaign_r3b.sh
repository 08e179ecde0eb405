#!/bin/bash
# Round-3 RD campaign, phases 2-6 (phase 1 = P-codec lambda=640 runs
# separately; this script waits for it to exit first).  Budgets trimmed
# vs rd_campaign_r3.sh so the whole campaign fits the round: lambda=320
# trains 3000 steps (2000 cascade) and the I-codecs 2000 steps each.
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT

# wait for phase 1 (any running main.py) to finish
while ps -o args= -A | grep -v grep | grep -q "python main.py --lambda-rd 640"; do
  sleep 60
done
echo "PHASE1_DONE (observed exit)" >> $OUT/campaign.log

timeout 5000 python train_image.py --lmbda 0.0483 --steps 2000 --synthetic \
  --batch-size 8 --log-root $OUT
echo "PHASE2_DONE rc=$?" >> $OUT/campaign.log

timeout 9500 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 3000 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 1000 --log-root $OUT
echo "PHASE3_DONE rc=$?" >> $OUT/campaign.log

timeout 5000 python train_image.py --lmbda 0.025 --steps 2000 --synthetic \
  --batch-size 8 --log-root $OUT
echo "PHASE4_DONE rc=$?" >> $OUT/campaign.log

timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained
echo "PHASE5_DONE rc=$?" >> $OUT/campaign.log

timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
  --output $OUT/eval_untrained
echo "PHASE6_DONE rc=$?" >> $OUT/campaign.log

timeout 600 python scripts/rd_compare.py \
  --trained $OUT/eval_trained/MSE/synthetic/synthetic_MSE.json \
  --untrained $OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json \
  --out $OUT/rd_comparison.json 2>/dev/null ||
  echo "rd_compare needs path fixup" >> $OUT/campaign.log
echo "CAMPAIGN_DONE" >> $OUT/campaign.log
