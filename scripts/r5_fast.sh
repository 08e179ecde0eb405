#!/bin/bash
# Fast serving profile: validate or drop (VERDICT r4 item 9).
# Fine-tunes a fast-profile (half-res flow base + MC fusion) checkpoint
# from the reference-shaped r5 P-codec (same param tree — the profile
# knobs only change resolutions), evaluates its RD under the protocol
# conditions, and benches it.  The comparison artifact decides whether
# the fast profile becomes a serving headline or gets deleted.
set -u
cd /root/repo
R5=output/rd_round5
FAST=output/rd_round5_fast
mkdir -p $FAST results
log() { echo "$1 $(date +%H:%M:%S)" >> $R5/campaign.log; }

# eval expects <root>/{mse_640,image_mse_640,semantic_640}; the fast
# profile shares the I-codec and semantic stack with the ref-shaped run
[ -e $FAST/image_mse_640 ] || ln -s ../../$R5/image_mse_640 $FAST/image_mse_640 2>/dev/null \
  || cp -r $R5/image_mse_640 $FAST/image_mse_640
[ -e $FAST/semantic_640 ] || ln -s ../../$R5/semantic_640 $FAST/semantic_640 2>/dev/null \
  || cp -r $R5/semantic_640 $FAST/semantic_640

if [ ! -d $FAST/mse_640/checkpoints/3057 ]; then
  timeout 4800 python main.py --synthetic --lambda-rd 640 --batch-size 4 \
    --crop 256 --log-root $FAST --run-name mse_640 --fast \
    --stage-steps 100,200,300,400,500 --mc-weight-final 0.2 \
    --init-from $R5/mse_640 --semantic-root $R5 \
    --steps 3057 --ckpt-every 250 --val-every 1000 \
    > $R5/leg_pfast.log 2>&1
  log "P_FAST rc=$?"
fi

timeout 2400 python test_video_tpu.py --synthetic --synthetic-size 448x832 \
  --frames 96 --checkpoint-root $FAST --lambdas 640 --metric mse --fast \
  --output $FAST/final > $R5/leg_evalfast.log 2>&1
log "EVAL_FAST rc=$?"

OUT=$FAST/final/MSE/HEVC_D/HEVC_D_MSE_640.json
if [ -s $OUT ] && [ -s results/rd_r5_640_final.json ]; then
  python - "$OUT" <<'EOF'
import json, sys
fast = json.load(open(sys.argv[1]))
ref = json.load(open("results/rd_r5_640_final.json"))
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
  git add results/rd_fast_vs_ref.json && git commit -q -m \
    "r5: fast serving profile RD validation vs reference-shaped (same protocol eval)" || true
  log "FAST_RD committed"
fi

# fast-profile bench (serving headline candidate)
timeout 1500 python bench.py --fast --ckpt-root $FAST \
  > results/bench_r5_fast.json 2> $R5/leg_benchfast.err
rc=$?
log "BENCH_FAST rc=$rc"
if [ $rc -eq 0 ] && [ -s results/bench_r5_fast.json ] \
   && python -c "import json;json.load(open('results/bench_r5_fast.json'))" 2>/dev/null; then
  git add results/bench_r5_fast.json && git commit -q -m \
    "r5: fast-profile bench (trained fast checkpoint)" || true
fi
