#!/bin/bash
# Round-4 final session: the machine rebuild wiped output/ AND the r4j/r4l
# results before they ran, so only rd_r4_early_640 + detection held-out
# exist from round 4.  This script fills the highest-value gaps with the
# restored 640 checkpoint trio (artifacts/*.tar.gz -> output/rd_round4):
#   A. MC fine-tune at 640 (mc_weight 0.2; rd_r4_early_640 showed
#      mcpsnr 14.7 < warppsnr 23.5 — MC must IMPROVE on warping)
#   B. step-2 semantic fine-tune from the MC-ft weights (Learner.py:661-698
#      semantics: P-codec adapts to REAL semantic features, not zeros)
#   C. full-stack eval -> rd_r4_640_final.json, the round's flagship
#   D. batch_streams=2 aggregate bench (r3 verdict #6)
#   E. 96-frame held-out 448x832 eval at 640 (r3 verdict #8)
# Usage: rd_campaign_r4m.sh DEADLINE_EPOCH
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

DEADLINE=${1:?pass deadline epoch}
log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }  # minutes
commit_res() { git add results/ && git commit -q -m "$1" || true; }

# wait for the in-flight driver-path bench to release the chip
for i in $(seq 60); do [ -f /tmp/bench_r4.done ] && break; sleep 15; done
commit_res "Driver-path bench on trained 640 weights (post-rebuild restore)"

# ---- A. MC fine-tune at lambda=640 -------------------------------------------
if [ "$(left)" -gt 28 ]; then
  timeout 1100 python main.py --lambda-rd 640 --synthetic --batch-size 4 \
    --steps 700 --stage-steps 100,200,300,400,500 --val-every 2000 \
    --ckpt-every 200 --log-root $OUT \
    --init-from $OUT/mse_640 --run-name mse_640_mcft --mc-weight-final 0.2
  log A_MCFT640 $?
fi

# ---- B. step-2 semantic fine-tune from the MC-ft weights ----------------------
STAGE=$OUT/stage_mcft640
if [ -d $OUT/mse_640_mcft/checkpoints ] && [ "$(left)" -gt 18 ]; then
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/mse_640_mcft $STAGE/mse_640
  ln -sfn $(pwd)/$OUT/image_mse_640 $STAGE/image_mse_640
  ln -sfn $(pwd)/$OUT/semantic_640 $STAGE/semantic_640
  timeout 800 python train_semantic.py --lambda-rd 640 --synthetic \
    --checkpoint-root $STAGE --steps 300 --batch-size 2 --log-root $OUT
  log B_SEMFT640 $?
fi

# ---- C. flagship eval: full stack staged --------------------------------------
if [ "$(left)" -gt 8 ]; then
  FSTAGE=$OUT/stage_final640
  mkdir -p $FSTAGE
  if [ -d $OUT/semantic_ft_mse_640/checkpoints ]; then
    ln -sfn $(pwd)/$OUT/semantic_ft_mse_640 $FSTAGE/mse_640
  elif [ -d $OUT/mse_640_mcft/checkpoints ]; then
    ln -sfn $(pwd)/$OUT/mse_640_mcft $FSTAGE/mse_640
  else
    ln -sfn $(pwd)/$OUT/mse_640 $FSTAGE/mse_640
  fi
  ln -sfn $(pwd)/$OUT/image_mse_640 $FSTAGE/image_mse_640
  ln -sfn $(pwd)/$OUT/semantic_640 $FSTAGE/semantic_640
  timeout 700 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 640 --checkpoint-root $FSTAGE --frames 25 \
    --output $OUT/eval_final640
  log C_EVALFINAL640 $?
  cp $OUT/eval_final640/MSE/HEVC_D/HEVC_D_MSE_640.json \
     $RES/rd_r4_640_final.json 2>/dev/null
  commit_res "Flagship lambda=640: MC-ft + step-2 semantic fine-tune, full 3-layer stack evaluated"
fi

# ---- D. b2 aggregate bench ----------------------------------------------------
if [ "$(left)" -gt 12 ]; then
  timeout 650 python bench.py --ckpt-root $OUT --batch 2 \
    > $RES/bench_r4_b2.json 2> $RES/bench_r4_b2.err
  log D_BENCH_B2 $?
  commit_res "batch_streams=2 aggregate bench after the decode working-set cuts"
fi

# ---- E. 96-frame held-out eval at 448x832 (640 only: 320 ckpt didn't survive) --
if [ "$(left)" -gt 16 ]; then
  timeout 900 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 640 --checkpoint-root $OUT --frames 96 \
    --synthetic-size 448x832 --synthetic-seed 1234 \
    --output $OUT/eval_96f
  log E_EVAL96F $?
  cp $OUT/eval_96f/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_96f_640.json 2>/dev/null
  commit_res "96-frame held-out 448x832 eval at 640, GOP-12 I-refresh exercised 8x"
fi

log CAMPAIGN_R4M_DONE 0
