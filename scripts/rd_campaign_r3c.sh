#!/bin/bash
# Round-3 RD campaign, continuation driver (phases 3-8).
#
# Phase 1 (P lambda=640, 1005 steps, bands 1-4) and phase 2 (I-codec
# lambda=0.0483) already ran; this script waits for the phase-2 PID to
# exit, snapshots the instrumented bench, then finishes the campaign:
# trains the second rate point, resumes lambda=640 through the cascade
# band, trains the matching I-codec, and runs the trained-vs-untrained
# real-bitstream eval + BD-rate comparison (VERDICT r2 items 1, 2, 8).
#
# Sequential: one TPU chip. Every phase timeout-bounded.
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT results

PHASE2_PID=${1:-0}
if [ "$PHASE2_PID" != "0" ]; then
  while kill -0 "$PHASE2_PID" 2>/dev/null; do sleep 30; done
fi
echo "PHASE2_DONE (observed exit)" >> $OUT/campaign.log

# Mid-round bench snapshot on the freed chip (pipelined runtime perf state)
timeout 2400 python bench.py --frames 8 > results/bench_mid_r3.json 2> $OUT/bench_mid.err
echo "BENCH_MID rc=$? $(cat results/bench_mid_r3.json | tail -1)" >> $OUT/campaign.log

# Phase 3: P-codec lambda=320, same schedule as lambda=640 + cascade tail
timeout 7000 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 1300 --stage-steps 400,600,800,1000,1200 --val-every 650 \
  --ckpt-every 650 --log-root $OUT
echo "PHASE3_DONE rc=$?" >> $OUT/campaign.log

# Phase 3b: resume lambda=640 from step 1005 through the cascade band
timeout 4000 python main.py --lambda-rd 640 --resume --synthetic --batch-size 4 \
  --steps 1300 --stage-steps 400,600,800,1000,1200 --val-every 650 \
  --ckpt-every 650 --log-root $OUT
echo "PHASE3B_DONE rc=$?" >> $OUT/campaign.log

# Phase 4: I-codec lambda matching P-320
timeout 5000 python train_image.py --lmbda 0.025 --steps 2000 --synthetic \
  --batch-size 8 --log-root $OUT
echo "PHASE4_DONE rc=$?" >> $OUT/campaign.log

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

# Phase 7: BD-rate between the two curves (across-lambda aggregates,
# written at <output>/MSE/synthetic/synthetic_MSE.json by write_aggregate)
TRAINED_JSON=$OUT/eval_trained/MSE/synthetic/synthetic_MSE.json
UNTRAINED_JSON=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py \
  --trained "$TRAINED_JSON" --untrained "$UNTRAINED_JSON" \
  --out $OUT/rd_comparison.json
echo "PHASE7_DONE rc=$?" >> $OUT/campaign.log

# Phase 8: copy committed-artifact set into results/
cp -v "$TRAINED_JSON" results/rd_trained_synthetic_MSE.json 2>/dev/null
cp -v "$UNTRAINED_JSON" results/rd_untrained_synthetic_MSE.json 2>/dev/null
cp -v $OUT/rd_comparison.json results/rd_comparison.json 2>/dev/null
echo "CAMPAIGN_DONE" >> $OUT/campaign.log
