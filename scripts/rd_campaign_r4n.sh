#!/bin/bash
# Round-4 continuation session: the rebuild killed r4m before any leg ran.
# Restored 640 trio (artifacts/*.tar.gz -> output/rd_round4) is staged; fill
# the remaining r3-verdict asks in priority order:
#   A. MC fine-tune at 640 (mc_weight 0.2): rd_r4_early_640 shows
#      mcpsnr 14.7 < warppsnr 23.5 — MC must IMPROVE on warping (ask #4)
#   B. flagship eval on the MC-ft weights with the full semantic stack
#      staged -> results/rd_r4_640_final.json (ask #2/#4 proof)
#   C. batch_streams=2 aggregate bench (ask #6)
#   D. 96-frame held-out 448x832 eval, GOP-12 I-refresh x8 (ask #8)
# Usage: rd_campaign_r4n.sh DEADLINE_EPOCH
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

DEADLINE=${1:?pass deadline epoch}
log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }  # minutes
commit_res() { git add results/ && git commit -q -m "$1" || true; }

# ---- A. MC fine-tune at lambda=640 -------------------------------------------
if [ "$(left)" -gt 30 ]; then
  # --init-from restores the step counter (the 640 ckpt is at step 700),
  # so the target must be ABSOLUTE: 1400 = 700 restored + 700 new steps.
  # r4m's "--steps 700" trained ~1 step and evaluated un-fine-tuned weights.
  timeout 1100 python main.py --lambda-rd 640 --synthetic --batch-size 4 \
    --steps 1400 --stage-steps 100,200,300,400,500 --val-every 2000 \
    --ckpt-every 200 --log-root $OUT \
    --init-from $OUT/mse_640 --run-name mse_640_mcft --mc-weight-final 0.2
  log A_MCFT640 $?
fi

# ---- B. flagship eval: MC-ft weights + full semantic stack --------------------
FSTAGE=$OUT/stage_final640
mkdir -p $FSTAGE
if [ -d $OUT/mse_640_mcft/checkpoints ]; then
  ln -sfn $(pwd)/$OUT/mse_640_mcft $FSTAGE/mse_640
else
  ln -sfn $(pwd)/$OUT/mse_640 $FSTAGE/mse_640
fi
ln -sfn $(pwd)/$OUT/image_mse_640 $FSTAGE/image_mse_640
ln -sfn $(pwd)/$OUT/semantic_640 $FSTAGE/semantic_640
if [ "$(left)" -gt 10 ]; then
  timeout 700 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 640 --checkpoint-root $FSTAGE --frames 25 \
    --output $OUT/eval_final640
  log B_EVALFINAL640 $?
  cp $OUT/eval_final640/MSE/HEVC_D/HEVC_D_MSE_640.json \
     $RES/rd_r4_640_final.json 2>/dev/null
  commit_res "Flagship lambda=640 eval: MC fine-tune + full 3-layer stack through real bitstreams"
fi

# ---- C. b2 aggregate bench ----------------------------------------------------
if [ "$(left)" -gt 13 ]; then
  timeout 650 python bench.py --ckpt-root $OUT --batch 2 \
    > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err
  log C_BENCH_B2 $?
  commit_res "batch_streams=2 aggregate bench after the decode working-set cuts"
fi

# ---- D. 96-frame held-out eval at 448x832 on the flagship stage ----------------
if [ "$(left)" -gt 16 ]; then
  timeout 900 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 640 --checkpoint-root $FSTAGE --frames 96 \
    --synthetic-size 448x832 --synthetic-seed 1234 \
    --output $OUT/eval_96f
  log D_EVAL96F $?
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
  commit_res "96-frame held-out 448x832 eval at 640, GOP-12 I-refresh exercised 8x"
fi

log CAMPAIGN_R4N_DONE 0
