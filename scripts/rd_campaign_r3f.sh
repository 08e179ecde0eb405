#!/bin/bash
# Round-3 RD campaign, final driver (r3f).
#
# r3e's cascade band still OOMed: per-frame remat alone leaves a
# 35.7 GB backward working set vs 15.75 GB HBM.  The trainer now ALSO
# microbatches the cascade update (lax.scan over the batch axis, B=1
# per iteration, grads accumulated) — peak memory scales with the
# microbatch.  Usage: rd_campaign_r3f.sh [wait_pid]
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT results
P=${1:-0}
if [ "$P" != "0" ]; then
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
echo "R3F_START $(date -u +%H:%M:%S)" >> $OUT/campaign.log

# lambda=320: resume from step 651 (band 4 tail -> cascade 1005 -> 1300)
timeout 7000 python main.py --lambda-rd 320 --resume --synthetic --batch-size 4 \
  --steps 1300 --stage-steps 400,600,800,1000,1200 --val-every 650 \
  --ckpt-every 650 --log-root $OUT
echo "PHASE3_DONE rc=$?" >> $OUT/campaign.log

# trained eval (real rANS bitstreams, trained P + trained I checkpoints)
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
echo "R3F_DONE" >> $OUT/campaign.log
