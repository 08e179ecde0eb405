#!/bin/bash
# Round-5 post-critical chain, priority-ordered to fit the remaining
# wall-clock (VERDICT r4 order): snapshot -> semantic on/off ablation
# (cheap: two evals, no training) -> driver-cache-warming bench + b2 ->
# slice A/B -> rate points 320/160 + curve + BD -> MS-SSIM point ->
# fast profile.  Every leg is idempotent and commits only valid JSON;
# later legs are sacrificial if the round ends first.
set -u
cd /root/repo
R5=output/rd_round5
mkdir -p $R5 results
log() { echo "$1 $(date +%H:%M:%S)" >> $R5/campaign.log; }
commit_json() { # commit_json <file> <msg>
  if [ -s "$1" ] && python -c "import json;json.load(open('$1'))" 2>/dev/null; then
    git add "$1" && git commit -q -m "$2" || true
    log "committed $1"
  else
    log "SKIP commit $1 (missing/invalid)"
  fi
}
retry_leg() { # rerun wedged (rc=17) / timed-out (rc=124) trainer legs
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

# ---- 1. snapshot the fine-tuned trio (rebuild survival) ----
SNAP_ROOT=$R5 bash scripts/snapshot_artifacts.sh mse_640 image_mse_640 semantic_640
git add artifacts && git commit -q -m "r5: checkpoint snapshots after MC fine-tune (rebuild survival)" || true
log "SNAPSHOT1 done"

# ---- 2. semantic on/off ablation at 640 (VERDICT item 6; same weights,
# eval-only, executables already warm from the critical path) ----
if [ ! -s $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json ]; then
  retry_leg wosm640 2 timeout 2400 python test_video_tpu.py --synthetic \
    --synthetic-size 448x832 --frames 96 --checkpoint-root $R5 \
    --lambdas 640 --metric mse --no-semantic --output $R5/wosm
fi
if [ -s results/rd_r5_640_final.json ] && [ -s $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json ]; then
  python scripts/semantic_ablation.py --with results/rd_r5_640_final.json \
    --without $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json \
    --out results/semantic_ablation_r5.json
  commit_json results/semantic_ablation_r5.json \
    "r5: semantic on/off ablation at lambda=640 (same weights, 96f protocol)"
fi

# ---- 3. bench with the fine-tuned checkpoints (warms /tmp/jax_cache
# for the driver's end-of-round run) + b2 aggregate ----
timeout 3000 python bench.py > results/bench_r5.json 2> $R5/leg_bench.err
rc=$?
log "BENCH rc=$rc"
[ $rc -eq 0 ] && commit_json results/bench_r5.json \
  "r5: 1080p bench with MC-fine-tuned checkpoints (serial + pipelined + GOP legs)"

timeout 2400 python bench.py --batch 2 --no-iframe > results/bench_r5_b2.json 2> $R5/leg_bench_b2.err
rc=$?
log "BENCH_B2 rc=$rc"
[ $rc -eq 0 ] && commit_json results/bench_r5_b2.json \
  "r5: batch_streams=2 aggregate throughput (VERDICT r4 missing #7)"

# ---- 4. slice-config A/B (VERDICT item 3; reference shapes, equal steps) ----
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
# A-side = pristine 700-step copies preserved before the fine-tunes
# extended those runs (equal steps vs the 700-step refslice B-sides)
if [ ! -d output/slice_ab_a/mse_640 ]; then
  mkdir -p output/slice_ab_a
  tar xzf artifacts/mse_640.tar.gz -C output/slice_ab_a || true
  tar xzf artifacts/image_mse_640.tar.gz -C output/slice_ab_a || true
fi
timeout 2000 python scripts/slice_ab.py \
  --i-a output/slice_ab_a/image_mse_640 --i-b $R5/image_mse_refslice640 \
  --p-a output/slice_ab_a/mse_640 --p-b $R5/mse_640_refslice \
  --out results/slice_ab.json > $R5/leg_sliceab.log 2>&1
log "SLICE_AB rc=$?"
commit_json results/slice_ab.json \
  "r5: slice-config A/B — TPU-native (10/2, 4/1) vs reference (10/5, 8/4) at equal steps"

# ---- 5. rate points 320/160 (rate-transfer fine-tunes from the 640 trio;
# VERDICT item 2) ----
for LAM in 320 160; do
  if [ ! -d $R5/semantic_$LAM/2400 ]; then
    retry_leg sem$LAM 2 timeout 2400 python train_semantic_stack.py \
      --lambda-rd $LAM --synthetic --steps 2400 --log-root $R5 --ckpt-every 400
    [ -d $R5/semantic_$LAM/2400 ] || retry_leg sem${LAM}r 4 timeout 2400 \
      python train_semantic_stack.py --lambda-rd $LAM --synthetic \
      --steps 2400 --log-root $R5 --ckpt-every 400 --resume
  fi
done

ILAM_320=0.025; ILAM_160=0.013
for LAM in 320 160; do
  eval IL=\$ILAM_$LAM
  if [ ! -d $R5/image_mse_$LAM/checkpoints/4000 ]; then
    retry_leg i$LAM 2 timeout 2400 python train_image.py --synthetic \
      --lmbda $IL --batch-size 8 --crop 256 --log-root $R5 --steps 4000 \
      --ckpt-every 500 --init-from $R5/image_mse_640
    [ -d $R5/image_mse_$LAM/checkpoints/4000 ] || retry_leg i${LAM}r 4 \
      timeout 2400 python train_image.py --synthetic --lmbda $IL \
      --batch-size 8 --crop 256 --log-root $R5 --steps 4000 \
      --ckpt-every 500 --resume
  fi
done

# P rate transfer: 600 steps past the 2557-step 640 base (adjacent-lambda
# transfer converges fast; the full 1000 would not fit the round)
for LAM in 320 160; do
  if [ ! -d $R5/mse_$LAM/checkpoints/3157 ]; then
    retry_leg p$LAM 2 timeout 4800 python main.py --synthetic --lambda-rd $LAM \
      --batch-size 4 --crop 256 --log-root $R5 --run-name mse_$LAM \
      --stage-steps 100,200,300,400,500 --mc-weight-final 0.2 \
      --init-from $R5/mse_640 --semantic-root $R5 \
      --steps 3157 --ckpt-every 200 --val-every 1000
    [ -d $R5/mse_$LAM/checkpoints/3157 ] || retry_leg p${LAM}r 5 timeout 4800 \
      python main.py --synthetic --lambda-rd $LAM \
      --batch-size 4 --crop 256 --log-root $R5 --run-name mse_$LAM \
      --stage-steps 100,200,300,400,500 --mc-weight-final 0.2 \
      --resume --semantic-root $R5 \
      --steps 3157 --ckpt-every 200 --val-every 1000
  fi
done

# ---- 6. 3-point curve eval + no-semantic anchor + BD-rate ----
retry_leg eval2pt 2 timeout 2400 python test_video_tpu.py --synthetic \
  --synthetic-size 448x832 --frames 96 --checkpoint-root $R5 \
  --lambdas 160 320 --metric mse --output $R5/final
for LAM in 160 320; do
  OUT=$R5/final/MSE/HEVC_D/HEVC_D_MSE_$LAM.json
  if [ -s $OUT ]; then
    cp $OUT results/rd_r5_${LAM}_final.json
    commit_json results/rd_r5_${LAM}_final.json \
      "r5: lambda=$LAM protocol eval (96f 448x832 GOP12, 3-layer bitstream)"
  fi
done

retry_leg wosm2 2 timeout 2400 python test_video_tpu.py --synthetic \
  --synthetic-size 448x832 --frames 96 --checkpoint-root $R5 \
  --lambdas 160 320 --metric mse --no-semantic --output $R5/wosm

if [ -s $R5/final/MSE/HEVC_D/HEVC_D_MSE_640.json ] \
   && [ -s $R5/final/MSE/HEVC_D/HEVC_D_MSE_320.json ] \
   && [ -s $R5/final/MSE/HEVC_D/HEVC_D_MSE_160.json ]; then
  python scripts/merge_rd.py --out results/rd_r5_curve.json \
    $R5/final/MSE/HEVC_D/HEVC_D_MSE_160.json \
    $R5/final/MSE/HEVC_D/HEVC_D_MSE_320.json \
    $R5/final/MSE/HEVC_D/HEVC_D_MSE_640.json
  commit_json results/rd_r5_curve.json \
    "r5: 3-point RD curve (lambda 160/320/640, 96f 448x832, real bitstreams)"
fi
if [ -s $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json ] \
   && [ -s $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_320.json ] \
   && [ -s $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_160.json ] \
   && [ -s results/rd_r5_curve.json ]; then
  python scripts/merge_rd.py --out results/rd_r5_wosm_curve.json \
    $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_160.json \
    $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_320.json \
    $R5/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json
  python scripts/bd_between.py --anchor results/rd_r5_wosm_curve.json \
    --test results/rd_r5_curve.json --out results/bd_r5.json
  commit_json results/rd_r5_wosm_curve.json "r5: no-semantic anchor curve (same weights)"
  commit_json results/bd_r5.json \
    "r5: BD-rate of the 3-layer scalable curve vs its no-semantic anchor"
fi

# snapshot the rate-point trios before the long tail
SNAP_ROOT=$R5 bash scripts/snapshot_artifacts.sh mse_320 image_mse_320 semantic_320 \
  mse_160 image_mse_160 semantic_160 2>/dev/null || true
git add artifacts && git commit -q -m "r5: rate-point checkpoint snapshots" || true

# ---- 7. MS-SSIM point at 640 (VERDICT item 5; l/50 rule) ----
if [ ! -d $R5/image_msssim_640/checkpoints/4000 ]; then
  retry_leg imsssim 2 timeout 2400 python train_image.py --synthetic \
    --metric msssim --lmbda 60.5 --tag 640 --batch-size 8 --crop 256 \
    --log-root $R5 --steps 4000 --ckpt-every 500 --init-from $R5/image_mse_640
  [ -d $R5/image_msssim_640/checkpoints/4000 ] || retry_leg imsssimr 4 \
    timeout 2400 python train_image.py --synthetic --metric msssim \
    --lmbda 60.5 --tag 640 --batch-size 8 --crop 256 \
    --log-root $R5 --steps 4000 --ckpt-every 500 --resume
fi
if [ ! -d $R5/msssim_640/checkpoints/3157 ]; then
  retry_leg pmsssim 2 timeout 4800 python main.py --synthetic --metric msssim \
    --lambda-rd 640 --batch-size 4 --crop 256 --log-root $R5 \
    --run-name msssim_640 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.2 --init-from $R5/mse_640 --semantic-root $R5 \
    --steps 3157 --ckpt-every 200 --val-every 1000
  [ -d $R5/msssim_640/checkpoints/3157 ] || retry_leg pmsssimr 5 \
    timeout 4800 python main.py --synthetic --metric msssim \
    --lambda-rd 640 --batch-size 4 --crop 256 --log-root $R5 \
    --run-name msssim_640 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.2 --resume --semantic-root $R5 \
    --steps 3157 --ckpt-every 200 --val-every 1000
fi
retry_leg evalmsssim 2 timeout 2400 python test_video_tpu.py --synthetic \
  --synthetic-size 448x832 --frames 96 --checkpoint-root $R5 \
  --lambdas 640 --metric msssim --output $R5/final
OUT=$R5/final/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json
if [ -s $OUT ]; then
  cp $OUT results/rd_r5_msssim_640.json
  commit_json results/rd_r5_msssim_640.json \
    "r5: MS-SSIM-trained point at lambda=640 (96f 448x832, 3-layer bitstream)"
fi

# ---- 8. fast serving profile (VERDICT item 9) ----
bash scripts/r5_fast.sh
log "FAST done"

log "POST2 done"
