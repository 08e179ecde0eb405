#!/bin/bash
# Round-5 critical path (VERDICT r4 items 1 + part of 2):
#   P fine-tune on REAL semantic features -> I-codec extension ->
#   eval-shape pre-warm -> flagship 96-frame protocol eval.
# Every trainer leg runs under a retry loop: the axon tunnel wedges
# clients intermittently (threads parked in futex_wait, no CPU); the
# in-process watchdog exits 17 and the loop reruns with --resume from
# the last periodic checkpoint.
set -u
cd /root/repo
R5=output/rd_round5
mkdir -p $R5 results
log() { echo "$1 $(date +%H:%M:%S)" >> $R5/campaign.log; }

# retry_leg <name> <max_tries> <cmd...>  — reruns while rc==17 (wedge) or
# rc==124 (timeout; SIGTERM-save keeps progress, resume continues)
retry_leg() {
  local name=$1 tries=$2; shift 2
  local n=0 rc=0
  while [ $n -lt $tries ]; do
    n=$((n + 1))
    "$@" >> $R5/leg_$name.log 2>&1
    rc=$?
    log "$name try=$n rc=$rc"
    [ $rc -eq 17 ] || [ $rc -eq 124 ] || break
    sleep 45  # let the tunnel's post-kill hang window pass
  done
  return $rc
}

# Leg 1: P-codec fine-tune conditioned on real frozen-student features
# (mse_640_mcft@1057 -> 2557; cascade band, mc_weight 0.2).  First try
# seeds from the r4 checkpoint via --init-from unless this run already
# has checkpoints; retries always --resume.
if [ ! -d $R5/mse_640/checkpoints/2557 ]; then
  if [ -d $R5/mse_640/checkpoints ] && [ -n "$(ls $R5/mse_640/checkpoints 2>/dev/null)" ]; then
    SEED_ARGS="--resume"
  else
    SEED_ARGS="--init-from output/rd_round4/mse_640_mcft"
  fi
  retry_leg pft 6 timeout 7200 python main.py --synthetic --lambda-rd 640 \
    --batch-size 4 --crop 256 --log-root $R5 --run-name mse_640 \
    --stage-steps 100,200,300,400,500 --mc-weight-final 0.2 \
    $SEED_ARGS --semantic-root $R5 \
    --steps 2557 --ckpt-every 250 --val-every 500
  # after the first attempt a checkpoint exists; subsequent wedge retries
  # must resume, so rerun the loop once more in resume mode if needed
  if [ ! -d $R5/mse_640/checkpoints/2557 ]; then
    retry_leg pft_resume 6 timeout 7200 python main.py --synthetic --lambda-rd 640 \
      --batch-size 4 --crop 256 --log-root $R5 --run-name mse_640 \
      --stage-steps 100,200,300,400,500 --mc-weight-final 0.2 \
      --resume --semantic-root $R5 \
      --steps 2557 --ckpt-every 250 --val-every 500
  fi
fi

# Leg 2: I-codec schedule extension 700 -> 3000 (cheap: 0.44 s/it)
if [ ! -d $R5/image_mse_640/checkpoints/3000 ]; then
  retry_leg iext 5 timeout 3600 python train_image.py --synthetic \
    --lmbda 0.0483 --batch-size 8 --crop 256 \
    --log-root $R5 --steps 3000 --resume --ckpt-every 500
fi

# Leg 3: pre-warm every eval executable at the protocol shape (2 frames)
# so leg 4 is pure execution (r4's B_EVALFINAL640 died to compile cost)
retry_leg prewarm 3 timeout 3000 python test_video_tpu.py --synthetic \
  --synthetic-size 448x832 --frames 2 \
  --checkpoint-root $R5 --lambdas 640 --metric mse --output $R5/prewarm

# Leg 4: flagship protocol eval — 96 frames, 448x832, GOP 12, real
# bitstreams, all three layers
retry_leg final 3 timeout 2400 python test_video_tpu.py --synthetic \
  --synthetic-size 448x832 --frames 96 \
  --checkpoint-root $R5 --lambdas 640 --metric mse --output $R5/final
OUT=$R5/final/MSE/HEVC_D/HEVC_D_MSE_640.json
if [ -s $OUT ] && python -c "import json,sys; json.load(open('$OUT'))" 2>/dev/null; then
  cp $OUT results/rd_r5_640_final.json
  git add results/rd_r5_640_final.json
  git commit -q -m "r5 flagship: 3-layer protocol eval, 96 frames 448x832 GOP12 (results/rd_r5_640_final.json)" || true
  log "FINAL committed"
fi
