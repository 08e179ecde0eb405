#!/bin/bash
# Round-3 RD campaign, final driver.
#
# r3d's phase 3/3b died compiling the cascade band: the fully
# backpropagated unroll needs >=50 GB HBM un-rematerialized (3x the
# chip).  With jax.checkpoint now wrapping each frame's forward, resume
# both rate points through the cascade band, then evals + BD-rate +
# post-fusion bench.
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT results
echo "R3E_START $(date -u +%H:%M:%S)" >> $OUT/campaign.log

# lambda=320: resume from step 651 (band 4 -> cascade at 1000 -> 1300)
timeout 7000 python main.py --lambda-rd 320 --resume --synthetic --batch-size 4 \
  --steps 1300 --stage-steps 400,600,800,1000,1200 --val-every 650 \
  --ckpt-every 650 --log-root $OUT
echo "PHASE3_DONE rc=$?" >> $OUT/campaign.log

# lambda=640: resume from step 1005 (cascade band -> 1300)
timeout 5000 python main.py --lambda-rd 640 --resume --synthetic --batch-size 4 \
  --steps 1300 --stage-steps 400,600,800,1000,1200 --val-every 650 \
  --ckpt-every 650 --log-root $OUT
echo "PHASE3B_DONE rc=$?" >> $OUT/campaign.log

# trained eval
timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained
echo "PHASE5_DONE rc=$?" >> $OUT/campaign.log

# untrained eval (fresh init) for the BD-rate comparison
timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
  --output $OUT/eval_untrained
echo "PHASE6_DONE rc=$?" >> $OUT/campaign.log

TRAINED_JSON=$OUT/eval_trained/MSE/synthetic/synthetic_MSE.json
UNTRAINED_JSON=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py \
  --trained "$TRAINED_JSON" --untrained "$UNTRAINED_JSON" \
  --out $OUT/rd_comparison.json
echo "PHASE7_DONE rc=$?" >> $OUT/campaign.log

cp -v "$TRAINED_JSON" results/rd_trained_synthetic_MSE.json 2>/dev/null
cp -v "$UNTRAINED_JSON" results/rd_untrained_synthetic_MSE.json 2>/dev/null
cp -v $OUT/rd_comparison.json results/rd_comparison.json 2>/dev/null

timeout 2400 python bench.py --frames 8 > results/bench_post_r3.json 2> $OUT/bench_post.err
echo "BENCH_POST rc=$? $(tail -1 results/bench_post_r3.json)" >> $OUT/campaign.log
timeout 2400 python bench.py --frames 8 --batch 4 > results/bench_batch4_r3.json 2> $OUT/bench_batch4.err
echo "BENCH_BATCH4 rc=$? $(tail -1 results/bench_batch4_r3.json)" >> $OUT/campaign.log
echo "R3E_DONE" >> $OUT/campaign.log
