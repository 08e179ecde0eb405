#!/bin/bash
# Round-3 RD campaign, recovery driver.
#
# r3c's phase 3 died on the (now fixed) same-step checkpoint collision
# and phase 3b on a transient axon compile-helper 500 during the
# cascade-band compile.  This reruns them with the fix in place, then
# the trained/untrained evals, BD-rate comparison, and a post-fusion
# bench snapshot.  Usage: rd_campaign_r3d.sh [phase4_pid]
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT results

P4=${1:-0}
if [ "$P4" != "0" ]; then
  while kill -0 "$P4" 2>/dev/null; do sleep 30; done
fi
echo "R3D_START $(date -u +%H:%M:%S)" >> $OUT/campaign.log

# Phase 3 rerun: P-codec lambda=320 through the cascade band
timeout 7000 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 1300 --stage-steps 400,600,800,1000,1200 --val-every 650 \
  --ckpt-every 650 --log-root $OUT
echo "PHASE3_DONE rc=$?" >> $OUT/campaign.log

# Phase 3b rerun: lambda=640 resumed 1005 -> 1300 (cascade band); one retry
for attempt in 1 2; do
  timeout 4000 python main.py --lambda-rd 640 --resume --synthetic \
    --batch-size 4 --steps 1300 --stage-steps 400,600,800,1000,1200 \
    --val-every 650 --ckpt-every 650 --log-root $OUT
  rc=$?
  echo "PHASE3B_DONE attempt=$attempt rc=$rc" >> $OUT/campaign.log
  [ $rc -eq 0 ] && break
  sleep 60
done

# Phase 5: real-bitstream RD eval on the trained checkpoints
timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained
echo "PHASE5_DONE rc=$?" >> $OUT/campaign.log

# Phase 6: identical eval from fresh init (trained-vs-untrained BD-rate)
timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
  --output $OUT/eval_untrained
echo "PHASE6_DONE rc=$?" >> $OUT/campaign.log

# Phase 7: BD-rate between the two aggregate curves
TRAINED_JSON=$OUT/eval_trained/MSE/synthetic/synthetic_MSE.json
UNTRAINED_JSON=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py \
  --trained "$TRAINED_JSON" --untrained "$UNTRAINED_JSON" \
  --out $OUT/rd_comparison.json
echo "PHASE7_DONE rc=$?" >> $OUT/campaign.log

cp -v "$TRAINED_JSON" results/rd_trained_synthetic_MSE.json 2>/dev/null
cp -v "$UNTRAINED_JSON" results/rd_untrained_synthetic_MSE.json 2>/dev/null
cp -v $OUT/rd_comparison.json results/rd_comparison.json 2>/dev/null

# Post-fusion bench snapshot (fused one-dispatch encode + fused decode tails)
timeout 2400 python bench.py --frames 8 > results/bench_post_r3.json 2> $OUT/bench_post.err
echo "BENCH_POST rc=$? $(tail -1 results/bench_post_r3.json)" >> $OUT/campaign.log
echo "R3D_DONE" >> $OUT/campaign.log
