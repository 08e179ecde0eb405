#!/bin/bash
# Round-5 tail replacement (run after post2's b2 leg, instead of the
# rate-point tail that no longer fits the round): push the MC stage past
# warp at protocol scale.  The 2557-step checkpoint's MC beats warp on
# 256px validation crops (mc_d 0.00307 < warp_d 0.00320 @2500) but sits
# 0.22 dB below at 448x832/GOP12 (results/rd_r5_640_final.json).  Extend
# the cascade fine-tune 500 steps at mc_weight 0.35, then re-run the
# protocol eval into a SEPARATE artifact (the committed flagship +
# ablation pair stay at 2557 weights).  Then the slice A/B if time.
set -u
cd /root/repo
R5=output/rd_round5
mkdir -p $R5 results
log() { echo "$1 $(date +%H:%M:%S)" >> $R5/campaign.log; }
commit_json() {
  if [ -s "$1" ] && python -c "import json;json.load(open('$1'))" 2>/dev/null; then
    git add "$1" && git commit -q -m "$2" || true
    log "committed $1"
  else
    log "SKIP commit $1 (missing/invalid)"
  fi
}
retry_leg() {
  local name=$1 tries=$2; shift 2
  local n=0 rc=0
  while [ $n -lt $tries ]; do
    n=$((n + 1))
    "$@" >> $R5/leg_$name.log 2>&1
    rc=$?
    log "$name try=$n rc=$rc"
    [ $rc -eq 17 ] || [ $rc -eq 124 ] || break
    sleep 45
  done
  return $rc
}

# ---- MC-weight extension: 2557 -> 3057 at mc_weight 0.35 ----
if [ ! -d $R5/mse_640/checkpoints/3057 ]; then
  retry_leg mcext 4 timeout 3000 python main.py --synthetic --lambda-rd 640 \
    --batch-size 4 --crop 256 --log-root $R5 --run-name mse_640 \
    --stage-steps 100,200,300,400,500 --mc-weight-final 0.35 \
    --resume --semantic-root $R5 \
    --steps 3057 --ckpt-every 250 --val-every 250
fi

# ---- protocol re-eval into a separate artifact ----
retry_leg final2 2 timeout 2400 python test_video_tpu.py --synthetic \
  --synthetic-size 448x832 --frames 96 \
  --checkpoint-root $R5 --lambdas 640 --metric mse --output $R5/final2
OUT=$R5/final2/MSE/HEVC_D/HEVC_D_MSE_640.json
if [ -s $OUT ]; then
  cp $OUT results/rd_r5_640_mcext.json
  commit_json results/rd_r5_640_mcext.json \
    "r5: MC-weight extension (mc 0.35, +500 steps) protocol eval — MC-vs-warp at 96f 448x832"
fi

# ---- snapshot the extended P checkpoint ----
SNAP_ROOT=$R5 bash scripts/snapshot_artifacts.sh mse_640
git add artifacts && git commit -q -m "r5: MC-extension checkpoint snapshot" || true

# ---- slice A/B if the round still has room ----
if [ ! -d $R5/image_mse_refslice640/checkpoints/700 ]; then
  retry_leg irefslice 3 timeout 2400 python train_image.py --synthetic \
    --lmbda 0.0483 --batch-size 8 --crop 256 --log-root $R5 --steps 700 \
    --ckpt-every 350 --num-slices 10 --max-support-slices 5 --tag refslice640
fi
if [ ! -d $R5/mse_640_refslice/checkpoints/700 ]; then
  retry_leg prefslice 3 timeout 4800 python main.py --synthetic \
    --lambda-rd 640 --batch-size 4 \
    --crop 256 --log-root $R5 --run-name mse_640_refslice \
    --stage-steps 100,200,300,400,500 \
    --cond-num-slices 8 --cond-max-support-slices 4 \
    --steps 700 --ckpt-every 350 --val-every 5000
fi
if [ ! -d output/slice_ab_a/mse_640 ]; then
  mkdir -p output/slice_ab_a
  tar xzf artifacts/mse_640.tar.gz -C output/slice_ab_a || true
  tar xzf artifacts/image_mse_640.tar.gz -C output/slice_ab_a || true
fi
# only include the P-codec pair at equal steps; a half-trained refslice
# side would make the A/B unfair (slice_ab.py restores the latest step)
P_ARGS=""
if [ -d $R5/mse_640_refslice/checkpoints/700 ]; then
  P_ARGS="--p-a output/slice_ab_a/mse_640 --p-b $R5/mse_640_refslice"
fi
timeout 2000 python scripts/slice_ab.py \
  --i-a output/slice_ab_a/image_mse_640 --i-b $R5/image_mse_refslice640 \
  $P_ARGS \
  --out results/slice_ab.json > $R5/leg_sliceab.log 2>&1
log "SLICE_AB rc=$?"
commit_json results/slice_ab.json \
  "r5: slice-config A/B — TPU-native (10/2, 4/1) vs reference (10/5, 8/4) at equal steps"
log "MCFLIP done"
