#!/bin/bash
# Round-4 RD campaign, part 3: the fast serving profile (half-res flow
# base + MC fusion).  Trains a lambda-640 fast-profile point, evaluates
# its RD against the reference-shaped 640 point, and records the fast
# bench.  Run after rd_campaign_r4a.sh (needs image_mse_640/semantic_640
# from part 1, which the fast profile shares).
set -x
cd /root/repo
OUT=output/rd_round4_fast
REF=output/rd_round4
RES=results
mkdir -p $OUT

log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $REF/campaign.log; }

timeout 7200 python main.py --fast --lambda-rd 640 --synthetic \
  --batch-size 4 --steps 3200 --stage-steps 400,600,800,1000,1200 \
  --val-every 1000 --ckpt-every 800 --log-root $OUT
log PHASE22_PFAST640 $?

# share the I-codec and the semantic stack with the reference profile
ln -sfn $(pwd)/$REF/image_mse_640 $OUT/image_mse_640
ln -sfn $(pwd)/$REF/semantic_640 $OUT/semantic_640

timeout 3000 python test_video_tpu.py --fast --synthetic --metric mse \
  --lambdas 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_fast
log PHASE23_EVALFAST $?
cp $OUT/eval_fast/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_fast_640.json 2>/dev/null

timeout 3000 python bench.py --fast --ckpt-root $OUT > $RES/bench_r4_fast.json \
  2> $RES/bench_r4_fast.err
log PHASE24_BENCHFAST $?

log CAMPAIGN_PART3_DONE 0
