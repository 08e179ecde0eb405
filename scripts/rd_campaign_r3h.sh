#!/bin/bash
# Round-3 RD campaign, resumable interleaved driver (r3h).
#
# r3g's weakness: all evals ran at the end, so an interrupted campaign
# (VM restart, session death — both happened this round) left trained
# checkpoints but zero committed RD evidence.  r3h restructures:
#
#   SMOKE    — 8-step staged run through the cascade band (validates the
#              microbatched band-5 compile on this VM and warms
#              /tmp/jax_cache for every band graph)
#   SMOKEVAL — real-bitstream eval against the smoke checkpoint
#              (validates the TrainState restore path BEFORE spending
#              hours training); campaign aborts if this fails
#   per lambda in {320, 640}:
#     P<L>   — staged P-frame training, 800 cascade steps
#     I<L>   — I-codec training at the mapped i_lambda
#     EVT<L> — trained eval, this lambda only -> eval_trained_<L>
#     EVU<L> — untrained (fresh-init) eval     -> eval_untrained_<L>
#     CMP<L> — trained-vs-untrained comparison -> rd_comparison_<L>.json
#     artifacts copied into results/ immediately
#   FINAL    — combined 2-lambda trained+untrained eval + BD-rate
#
# Run fully detached (survives the driver session):
#   setsid nohup bash scripts/rd_campaign_r3h.sh > /tmp/r3h.out 2>&1 &
set -x
cd /root/repo
OUT=output/rd_round3
mkdir -p $OUT results
log() { echo "$1 $(date -u +%H:%M:%S)" >> $OUT/campaign.log; }

log R3H_START

# ---- smoke: band-5 compile + checkpoint/restore round trip -------------
if [ ! -f /tmp/smoke3/.ok ]; then
  rm -rf /tmp/smoke3; mkdir -p /tmp/smoke3
  timeout 4000 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
    --steps 8 --stage-steps 1,2,3,4,5 --ckpt-every 4 --log-root /tmp/smoke3
  RC=$?; log "SMOKE_DONE rc=$RC"
  [ $RC -ne 0 ] && { log R3H_ABORT_SMOKE; exit 1; }
  timeout 4000 python test_video_tpu.py --synthetic --dataset synthetic \
    --metric mse --lambdas 320 --checkpoint-root /tmp/smoke3 --frames 13 \
    --output /tmp/smoke3/eval
  RC=$?; log "SMOKEVAL_DONE rc=$RC"
  [ $RC -ne 0 ] && { log R3H_ABORT_SMOKEVAL; exit 1; }
  touch /tmp/smoke3/.ok
fi

ilam() { case $1 in 320) echo 0.025;; 640) echo 0.0483;; esac; }

for LAM in 320 640; do
  if [ ! -f $OUT/.p${LAM}_done ]; then
    timeout 9000 python main.py --lambda-rd $LAM --synthetic --batch-size 4 \
      --steps 2000 --stage-steps 400,600,800,1000,1200 --val-every 600 \
      --ckpt-every 200 --log-root $OUT
    log "P${LAM}_DONE rc=$?"
    cp -v $OUT/mse_${LAM}/train_*.log results/train_p${LAM}.log
    cp -v $OUT/mse_${LAM}/summary/scalars.jsonl results/train_p${LAM}_scalars.jsonl
    touch $OUT/.p${LAM}_done
  fi

  if [ ! -f $OUT/.i${LAM}_done ]; then
    timeout 5000 python train_image.py --lmbda $(ilam $LAM) --tag $LAM \
      --synthetic --steps 2000 --batch-size 8 --ckpt-every 500 --log-root $OUT
    log "I${LAM}_DONE rc=$?"
    cp -v $OUT/image_mse_${LAM}/train_*.log results/train_i${LAM}.log
    touch $OUT/.i${LAM}_done
  fi

  if [ ! -f $OUT/.ev${LAM}_done ]; then
    timeout 6000 python test_video_tpu.py --synthetic --dataset synthetic \
      --metric mse --lambdas $LAM --checkpoint-root $OUT --frames 25 \
      --output $OUT/eval_trained_${LAM}
    log "EVT${LAM}_DONE rc=$?"
    timeout 6000 python test_video_tpu.py --synthetic --dataset synthetic \
      --metric mse --lambdas $LAM --checkpoint-root /nonexistent --frames 25 \
      --output $OUT/eval_untrained_${LAM}
    log "EVU${LAM}_DONE rc=$?"
    T=$OUT/eval_trained_${LAM}/MSE/synthetic/synthetic_MSE.json
    U=$OUT/eval_untrained_${LAM}/MSE/synthetic/synthetic_MSE.json
    timeout 600 python scripts/rd_compare.py --trained "$T" --untrained "$U" \
      --out $OUT/rd_comparison_${LAM}.json
    log "CMP${LAM}_DONE rc=$?"
    cp -v "$T" results/rd_trained_${LAM}_synthetic_MSE.json
    cp -v "$U" results/rd_untrained_${LAM}_synthetic_MSE.json
    cp -v $OUT/rd_comparison_${LAM}.json results/
    touch $OUT/.ev${LAM}_done
  fi
done

# ---- combined 2-lambda curves + BD-rate ---------------------------------
timeout 9000 python test_video_tpu.py --synthetic --dataset synthetic \
  --metric mse --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_trained
log "EVALT_DONE rc=$?"
timeout 9000 python test_video_tpu.py --synthetic --dataset synthetic \
  --metric mse --lambdas 320 640 --checkpoint-root /nonexistent --frames 25 \
  --output $OUT/eval_untrained
log "EVALU_DONE rc=$?"
T=$OUT/eval_trained/MSE/synthetic/synthetic_MSE.json
U=$OUT/eval_untrained/MSE/synthetic/synthetic_MSE.json
timeout 600 python scripts/rd_compare.py --trained "$T" --untrained "$U" \
  --out $OUT/rd_comparison.json
log "CMP_DONE rc=$?"
cp -v "$T" results/rd_trained_synthetic_MSE.json
cp -v "$U" results/rd_untrained_synthetic_MSE.json
cp -v $OUT/rd_comparison.json results/rd_comparison.json
log R3H_DONE
