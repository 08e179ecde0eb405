#!/bin/bash
# Round-6 campaign: everything runs on the REVERTED (reference) slice
# shapes — ImageCodec 10/5, ConditionalCodec 8/4 (VERDICT r5 item 1).
# Priority order = the verdict's: (1) fresh lambda=640 trio + owed
# P-codec slice A/B, (2) MC>warp protocol tail, (3) rate transfer to
# {160,320} + 3-point curve + BD-rate JSON, (4) MS-SSIM point, then
# extras (lambda=80).  Every leg is idempotent (checkpoint-guarded),
# retries fall back to --resume (ADVICE r5 #1), and artifacts commit as
# they land so later legs are sacrificial if the round ends first.
set -u
cd /root/repo
R6=output/rd_round6
mkdir -p $R6 results
log() { echo "$1 $(date +%H:%M:%S)" >> $R6/campaign.log; }
commit_json() { # commit_json <file> <msg>
  if [ -s "$1" ] && python -c "import json;json.load(open('$1'))" 2>/dev/null; then
    git add "$1" && git commit -q -m "$2" || true
    log "committed $1"
  else
    log "SKIP commit $1 (missing/invalid)"
  fi
}
# run a trainer leg; on wedge (rc=17) or timeout (rc=124) retry WITH
# --resume so a paid compile / trained steps are never lost
train_leg() { # train_leg <name> <tries> <timeout> <cmd...> (cmd carries its own `timeout`)
  local name=$1 tries=$2 tmo=$3; shift 3
  local n=0 rc=0
  "$@" >> $R6/leg_$name.log 2>&1
  rc=$?
  log "$name try=1 rc=$rc"
  while { [ $rc -eq 17 ] || [ $rc -eq 124 ] || [ $rc -eq 137 ]; } && [ $n -lt $tries ]; do
    n=$((n + 1)); sleep 45
    "$@" --resume >> $R6/leg_$name.log 2>&1
    rc=$?
    log "$name resume-try=$n rc=$rc"
  done
  return $rc
}

# ---- 0. semantic_640 carries over unchanged (its codec shapes did not
# move); seed it from the restored r5 snapshot ----
if [ ! -d $R6/semantic_640/400 ]; then
  cp -r output/rd_round5/semantic_640 $R6/ 2>/dev/null || \
    { mkdir -p output/rd_round5 && tar xzf artifacts/semantic_640.tar.gz \
        -C output/rd_round5 && cp -r output/rd_round5/semantic_640 $R6/; }
fi
log "SEM640 seeded"

# ---- 1. I-codec lambda=640 on 10/5 (may already be running/done from
# the interactive session) ----
if [ ! -d $R6/image_mse_640/checkpoints/3000 ]; then
  train_leg i640 4 3000 timeout 3000 python train_image.py --synthetic \
    --lmbda 0.0483 --batch-size 8 --crop 256 --log-root $R6 --steps 3000 \
    --ckpt-every 500
fi

# ---- 2a. P-codec lambda=640 on 8/4, phase 1 to step 700 (the A/B
# comparison point; ckpt cadence lands exactly on 700) ----
if [ ! -d $R6/mse_640/checkpoints/700 ] && [ ! -d $R6/mse_640_s700 ]; then
  train_leg p640a 4 4800 timeout 4800 python main.py --synthetic \
    --lambda-rd 640 --batch-size 4 --crop 256 --log-root $R6 \
    --run-name mse_640 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.35 --semantic-root $R6 \
    --steps 700 --ckpt-every 350 --val-every 5000
fi
# preserve the step-700 state before the run extends past it (orbax
# keeps 5 checkpoints; ADVICE r5 #2's staleness trap)
if [ -d $R6/mse_640/checkpoints/700 ] && [ ! -d $R6/mse_640_s700 ]; then
  cp -r $R6/mse_640 $R6/mse_640_s700
  log "S700 snapshot"
fi

# ---- 2b. the owed 4/1 leg (equal steps, equal data, equal lambda) ----
if [ ! -d $R6/mse_640_nativeslice/checkpoints/700 ]; then
  train_leg p640n 4 4800 timeout 4800 python main.py --synthetic \
    --lambda-rd 640 --batch-size 4 --crop 256 --log-root $R6 \
    --run-name mse_640_nativeslice --stage-steps 100,200,300,400,500 \
    --cond-num-slices 4 --cond-max-support-slices 1 \
    --mc-weight-final 0.35 --semantic-root $R6 \
    --steps 700 --ckpt-every 350 --val-every 5000
fi

# ---- 2c. P-codec slice A/B at pinned step 700 (VERDICT r5 item 1a /
# weak #5: the pair that decodes every frame) ----
if [ ! -s results/slice_ab_p.json ] \
   && [ -d $R6/mse_640_nativeslice/checkpoints/700 ] \
   && [ -d $R6/mse_640_s700/checkpoints/700 ]; then
  timeout 2000 python scripts/slice_ab.py \
    --p-a $R6/mse_640_nativeslice --p-b $R6/mse_640_s700 --p-step 700 \
    --out results/slice_ab_p.json > $R6/leg_sliceab_p.log 2>&1
  log "SLICE_AB_P rc=$?"
  commit_json results/slice_ab_p.json \
    "P-codec slice A/B at equal 700 steps: TPU-native 4/1 vs reference 8/4 (the owed pair from r5)"
fi

# ---- 2d. P-640 phase 2: extend to 2100 at crop 256 ----
if [ ! -d $R6/mse_640/checkpoints/2100 ]; then
  train_leg p640b 5 4800 timeout 4800 python main.py --synthetic \
    --lambda-rd 640 --batch-size 4 --crop 256 --log-root $R6 \
    --run-name mse_640 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.35 --semantic-root $R6 --resume \
    --steps 2100 --ckpt-every 350 --val-every 1000
fi

# ---- 2e. P-640 phase 3: protocol-resolution MC tail (VERDICT item 2 —
# the crossover trend says MC>warp needs training at eval resolution);
# 448^2 crops at batch 2, falling back to 384 if the 448 program OOMs ----
if [ ! -d $R6/mse_640/checkpoints/2400 ]; then
  train_leg p640c 4 4800 timeout 4800 python main.py --synthetic \
    --lambda-rd 640 --batch-size 2 --crop 448 --log-root $R6 \
    --run-name mse_640 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.35 --semantic-root $R6 --resume \
    --steps 2400 --ckpt-every 150 --val-every 5000
  if [ ! -d $R6/mse_640/checkpoints/2400 ]; then
    train_leg p640c384 4 4800 timeout 4800 python main.py --synthetic \
      --lambda-rd 640 --batch-size 2 --crop 384 --log-root $R6 \
      --run-name mse_640 --stage-steps 100,200,300,400,500 \
      --mc-weight-final 0.35 --semantic-root $R6 --resume \
      --steps 2400 --ckpt-every 150 --val-every 5000
  fi
fi

# snapshot the 640 trio (rebuild survival) before the long tail
SNAP_ROOT=$R6 bash scripts/snapshot_artifacts.sh mse_640 image_mse_640 semantic_640
git add artifacts && git commit -q -m "r6: lambda=640 checkpoint snapshots (reference slice shapes)" || true
log "SNAPSHOT640 done"

# ---- 3. flagship protocol eval at 640 (96f 448x832, real bitstreams;
# done here so the headline lands even if the round dies in the rate
# transfers) ----
if [ ! -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_640.json ]; then
  timeout 3000 python test_video_tpu.py --synthetic \
    --synthetic-size 448x832 --frames 96 --checkpoint-root $R6 \
    --lambdas 640 --metric mse --output $R6/final >> $R6/leg_eval640.log 2>&1
  log "EVAL640 rc=$?"
fi
if [ -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_640.json ]; then
  cp $R6/final/MSE/HEVC_D/HEVC_D_MSE_640.json results/rd_r6_640_final.json
  commit_json results/rd_r6_640_final.json \
    "r6 flagship: lambda=640 protocol eval on reference slice shapes (96f 448x832 GOP12, protocol-res MC tail)"
fi

# ---- 4. rate transfers (I, semantic, P) to lambda in {320,160} ----
ILAM_320=0.025; ILAM_160=0.013
for LAM in 320 160; do
  eval IL=\$ILAM_$LAM
  if [ ! -d $R6/image_mse_$LAM/checkpoints/4000 ]; then
    train_leg i$LAM 3 2400 timeout 2400 python train_image.py --synthetic \
      --lmbda $IL --batch-size 8 --crop 256 --log-root $R6 --steps 4000 \
      --ckpt-every 500 --init-from $R6/image_mse_640
  fi
  if [ ! -d $R6/semantic_$LAM/800 ]; then
    train_leg sem$LAM 3 2400 timeout 2400 python train_semantic_stack.py \
      --lambda-rd $LAM --synthetic --steps 800 --log-root $R6 \
      --ckpt-every 200 --init-from $R6/semantic_640
  fi
done
for LAM in 320 160; do
  if [ ! -d $R6/mse_$LAM/checkpoints/3000 ]; then
    train_leg p$LAM 5 4800 timeout 4800 python main.py --synthetic \
      --lambda-rd $LAM --batch-size 4 --crop 256 --log-root $R6 \
      --run-name mse_$LAM --stage-steps 100,200,300,400,500 \
      --mc-weight-final 0.35 --init-from $R6/mse_640 --semantic-root $R6 \
      --steps 3000 --ckpt-every 200 --val-every 1000
  fi
done

# ---- 5. 3-point curve + no-semantic anchor + BD-rate ----
if [ ! -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_320.json ] \
   || [ ! -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_160.json ]; then
  timeout 3600 python test_video_tpu.py --synthetic \
    --synthetic-size 448x832 --frames 96 --checkpoint-root $R6 \
    --lambdas 320 160 --metric mse --output $R6/final >> $R6/leg_eval2pt.log 2>&1
  log "EVAL2PT rc=$?"
fi
for LAM in 160 320; do
  OUT=$R6/final/MSE/HEVC_D/HEVC_D_MSE_$LAM.json
  if [ -s $OUT ]; then
    cp $OUT results/rd_r6_${LAM}_final.json
    commit_json results/rd_r6_${LAM}_final.json \
      "r6: lambda=$LAM protocol eval (96f 448x832 GOP12, rate-transferred from 640)"
  fi
done
if [ -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_640.json ] \
   && [ -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_320.json ] \
   && [ -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_160.json ]; then
  python scripts/merge_rd.py --out results/rd_r6_curve.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_160.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_320.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_640.json
  commit_json results/rd_r6_curve.json \
    "r6: 3-point protocol RD curve (lambda 160/320/640, 96f 448x832, reference slice shapes)"
fi
if [ ! -s $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json ] \
   || [ ! -s $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_320.json ] \
   || [ ! -s $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_160.json ]; then
  timeout 4800 python test_video_tpu.py --synthetic \
    --synthetic-size 448x832 --frames 96 --checkpoint-root $R6 \
    --lambdas 640 320 160 --metric mse --no-semantic --output $R6/wosm \
    >> $R6/leg_wosm.log 2>&1
  log "WOSM rc=$?"
fi
if [ -s $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json ] \
   && [ -s $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_320.json ] \
   && [ -s $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_160.json ] \
   && [ -s results/rd_r6_curve.json ]; then
  python scripts/merge_rd.py --out results/rd_r6_wosm_curve.json \
    $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_160.json \
    $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_320.json \
    $R6/wosm/MSE/HEVC_D/HEVC_D_MSE_640.json
  python scripts/bd_between.py --anchor results/rd_r6_wosm_curve.json \
    --test results/rd_r6_curve.json --out results/bd_r6.json
  commit_json results/rd_r6_wosm_curve.json "r6: no-semantic anchor curve (same weights)"
  commit_json results/bd_r6.json \
    "r6: BD-rate JSON — 3-layer scalable curve vs its no-semantic anchor (eval/bdrate.py cubic fit)"
fi

# snapshot the rate-point runs
SNAP_ROOT=$R6 bash scripts/snapshot_artifacts.sh mse_320 image_mse_320 semantic_320 \
  mse_160 image_mse_160 semantic_160 2>/dev/null || true
git add artifacts && git commit -q -m "r6: rate-point checkpoint snapshots" || true

# ---- 6. MS-SSIM point at 640 (VERDICT item 3; l/50 rule, fine-tuned
# from the MSE trio exactly as the reference does, Learner.py:2286) ----
if [ ! -d $R6/image_msssim_640/checkpoints/4000 ]; then
  train_leg imsssim 3 2400 timeout 2400 python train_image.py --synthetic \
    --metric msssim --lmbda 60.5 --tag 640 --batch-size 8 --crop 256 \
    --log-root $R6 --steps 4000 --ckpt-every 500 --init-from $R6/image_mse_640
fi
if [ ! -d $R6/msssim_640/checkpoints/3000 ]; then
  train_leg pmsssim 5 4800 timeout 4800 python main.py --synthetic \
    --metric msssim --lambda-rd 640 --batch-size 4 --crop 256 \
    --log-root $R6 --run-name msssim_640 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.35 --init-from $R6/mse_640 --semantic-root $R6 \
    --steps 3000 --ckpt-every 200 --val-every 1000
fi
if [ ! -s $R6/final/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json ]; then
  timeout 3000 python test_video_tpu.py --synthetic \
    --synthetic-size 448x832 --frames 96 --checkpoint-root $R6 \
    --lambdas 640 --metric msssim --output $R6/final >> $R6/leg_evalmsssim.log 2>&1
  log "EVALMSSSIM rc=$?"
fi
OUT=$R6/final/MSSSIM/HEVC_D/HEVC_D_MSSSIM_640.json
if [ -s $OUT ]; then
  cp $OUT results/rd_r6_msssim_640.json
  commit_json results/rd_r6_msssim_640.json \
    "r6: MS-SSIM-trained point at lambda=640 (l/50 rule, fine-tuned from the MSE trio, 96f 448x832)"
fi
SNAP_ROOT=$R6 bash scripts/snapshot_artifacts.sh msssim_640 image_msssim_640 2>/dev/null || true
git add artifacts && git commit -q -m "r6: MS-SSIM checkpoint snapshots" || true

# ---- 6.5 fast serving profile: validate or drop (VERDICT item 6) ----
FAST=output/rd_round6_fast
mkdir -p $FAST
[ -e $FAST/image_mse_640 ] || cp -r $R6/image_mse_640 $FAST/image_mse_640
[ -e $FAST/semantic_640 ] || cp -r $R6/semantic_640 $FAST/semantic_640
if [ ! -d $FAST/mse_640/checkpoints/2800 ]; then
  train_leg pfast 3 3600 timeout 3600 python main.py --synthetic \
    --lambda-rd 640 --batch-size 4 --crop 256 --log-root $FAST \
    --run-name mse_640 --fast --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.35 --init-from $R6/mse_640 --semantic-root $R6 \
    --steps 2800 --ckpt-every 200 --val-every 5000
fi
if [ ! -s $FAST/final/MSE/HEVC_D/HEVC_D_MSE_640.json ]; then
  timeout 2400 python test_video_tpu.py --synthetic --synthetic-size 448x832 \
    --frames 96 --checkpoint-root $FAST --lambdas 640 --metric mse --fast \
    --output $FAST/final >> $R6/leg_evalfast.log 2>&1
  log "EVAL_FAST rc=$?"
fi
OUT=$FAST/final/MSE/HEVC_D/HEVC_D_MSE_640.json
if [ -s $OUT ] && [ -s results/rd_r6_640_final.json ]; then
  python - "$OUT" <<'EOF'
import json, sys
fast = json.load(open(sys.argv[1]))
ref = json.load(open("results/rd_r6_640_final.json"))
m = lambda d, k: sum(d["results"][k]) / len(d["results"][k])
out = {
    "fast": {k: m(fast, k) for k in ("psnr", "bpp", "ppsnr", "pbpp")},
    "reference_shaped": {k: m(ref, k) for k in ("psnr", "bpp", "ppsnr", "pbpp")},
    "delta": {
        "psnr_db": m(fast, "psnr") - m(ref, "psnr"),
        "bpp": m(fast, "bpp") - m(ref, "bpp"),
    },
    "conditions": {"fast": fast.get("conditions"), "ref": ref.get("conditions")},
}
json.dump(out, open("results/rd_fast_vs_ref.json", "w"), indent=2)
print(json.dumps(out["delta"]))
EOF
  commit_json results/rd_fast_vs_ref.json \
    "r6: fast serving profile RD validation vs reference-shaped (same protocol eval, r6 checkpoints)"
  timeout 1500 python bench.py --fast --ckpt-root $FAST \
    > results/bench_r6_fast.json 2> $R6/leg_benchfast.err \
    && commit_json results/bench_r6_fast.json "r6: fast-profile bench (trained fast checkpoint)"
fi

# ---- 6.6 refresh the headline bench on the r6 checkpoints (also warms
# /tmp/jax_cache for the driver's end-of-round run) ----
timeout 3000 python bench.py > results/bench_r6.json 2> $R6/leg_bench.err
rc=$?
log "BENCH rc=$rc"
[ $rc -eq 0 ] && commit_json results/bench_r6.json \
  "r6: 1080p bench on reference-slice-shape checkpoints (p50/p90 dispersion, lookahead-first schedules)"

# ---- 7. lambda=80 fourth rate point (VERDICT item 10; stretch) ----
if [ ! -d $R6/image_mse_80/checkpoints/4000 ]; then
  train_leg i80 2 2400 timeout 2400 python train_image.py --synthetic \
    --lmbda 0.0067 --batch-size 8 --crop 256 --log-root $R6 --steps 4000 \
    --ckpt-every 500 --init-from $R6/image_mse_160
fi
if [ ! -d $R6/semantic_80/800 ]; then
  train_leg sem80 2 2400 timeout 2400 python train_semantic_stack.py \
    --lambda-rd 80 --synthetic --steps 800 --log-root $R6 \
    --ckpt-every 200 --init-from $R6/semantic_160
fi
if [ ! -d $R6/mse_80/checkpoints/3500 ]; then
  train_leg p80 4 4800 timeout 4800 python main.py --synthetic \
    --lambda-rd 80 --batch-size 4 --crop 256 --log-root $R6 \
    --run-name mse_80 --stage-steps 100,200,300,400,500 \
    --mc-weight-final 0.35 --init-from $R6/mse_160 --semantic-root $R6 \
    --steps 3500 --ckpt-every 200 --val-every 1000
fi
if [ ! -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_80.json ]; then
  timeout 3000 python test_video_tpu.py --synthetic \
    --synthetic-size 448x832 --frames 96 --checkpoint-root $R6 \
    --lambdas 80 --metric mse --output $R6/final >> $R6/leg_eval80.log 2>&1
fi
if [ -s $R6/final/MSE/HEVC_D/HEVC_D_MSE_80.json ] && [ -s results/rd_r6_curve.json ]; then
  cp $R6/final/MSE/HEVC_D/HEVC_D_MSE_80.json results/rd_r6_80_final.json
  python scripts/merge_rd.py --out results/rd_r6_curve4.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_80.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_160.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_320.json \
    $R6/final/MSE/HEVC_D/HEVC_D_MSE_640.json
  commit_json results/rd_r6_80_final.json "r6: lambda=80 protocol eval (fourth rate point)"
  commit_json results/rd_r6_curve4.json \
    "r6: 4-point protocol RD curve (lambda 80/160/320/640 — the reference's full operating range, utils.py:33)"
  SNAP_ROOT=$R6 bash scripts/snapshot_artifacts.sh mse_80 image_mse_80 semantic_80 2>/dev/null || true
  git add artifacts && git commit -q -m "r6: lambda=80 checkpoint snapshots" || true
fi

log "CAMPAIGN done"
