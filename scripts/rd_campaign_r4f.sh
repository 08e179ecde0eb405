#!/bin/bash
# Round-4 consolidated finisher.  Replaces r4d phases 6-9 + r4e after the
# second wall-clock audit (~3h50m left at 13:30): one 4-point eval with
# the semantic stack staged at every rate point subsumes the separate
# 3-layer eval, so the serial chain is
#   SEM320 -> P160/I160/SEM160 -> [P80/I80/SEM80 if clock allows]
#   -> EVAL(320,640,160[,80]) -> BD-rate -> [SEMFT320 + its eval if time].
# Clock gates: the 80-point block is skipped after GATE80, the semft
# block only runs before GATESEMFT.  Per-lambda JSONs land incrementally
# (eval order puts 320/640 first) so a timeout still leaves artifacts.
# $1: PID of the in-flight I320 training to wait for (0 = none).
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
GATE80=1550      # HHMM after which the 80-point block is skipped
GATESEMFT=1625   # HHMM after which the semft block is skipped

log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }
now() { date +%H%M; }

if [ -n "$1" ] && [ "$1" != "0" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi
log WAIT_I320_DONE 0

timeout 1500 python train_semantic_stack.py --lambda-rd 320 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log F_SEM320 $?

timeout 3300 python main.py --lambda-rd 160 --synthetic --batch-size 4 \
  --steps 1200 --stage-steps 200,300,400,500,600 --val-every 1200 \
  --ckpt-every 400 --log-root $OUT
log F_P160 $?
timeout 1500 python train_image.py --lmbda 0.013 --steps 1500 --synthetic \
  --batch-size 8 --log-root $OUT
log F_I160 $?
timeout 1200 python train_semantic_stack.py --lambda-rd 160 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log F_SEM160 $?

LAMBDAS="320 640 160"
if [ "$(now)" -lt "$GATE80" ]; then
  timeout 3300 python main.py --lambda-rd 80 --synthetic --batch-size 4 \
    --steps 1200 --stage-steps 200,300,400,500,600 --val-every 1200 \
    --ckpt-every 400 --log-root $OUT
  log F_P80 $?
  timeout 1500 python train_image.py --lmbda 0.0067 --steps 1500 --synthetic \
    --batch-size 8 --log-root $OUT
  log F_I80 $?
  timeout 1200 python train_semantic_stack.py --lambda-rd 80 --synthetic \
    --steps 600 --batch-size 2 --log-root $OUT
  log F_SEM80 $?
  LAMBDAS="320 640 160 80"
else
  log F_SKIP80 0
fi

timeout 3600 python test_video_tpu.py --synthetic --metric mse \
  --lambdas $LAMBDAS --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_4pt
log F_EVAL4PT $?
cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_4pt_agg.json 2>/dev/null
for L in $LAMBDAS; do
  cp $OUT/eval_4pt/MSE/HEVC_D/HEVC_D_MSE_$L.json $RES/rd_r4_4pt_$L.json 2>/dev/null
done

python scripts/bd_between.py \
  --anchor results/rd_trained_synthetic_MSE.json \
  --test $RES/rd_r4_4pt_agg.json \
  --out $RES/bd_r4_vs_r3.json
log F_BDRATE $?

if [ "$(now)" -lt "$GATESEMFT" ]; then
  timeout 1500 python train_semantic.py --lambda-rd 320 --synthetic \
    --checkpoint-root $OUT --steps 300 --batch-size 2 --log-root $OUT
  log F_SEMFT320 $?
  STAGE=$OUT/stage_semft320
  mkdir -p $STAGE
  ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
  ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
  ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
  timeout 1800 python test_video_tpu.py --synthetic --metric mse \
    --lambdas 320 --checkpoint-root $STAGE --frames 25 \
    --output $OUT/eval_semft
  log F_EVALSEMFT $?
  cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null
else
  log F_SKIPSEMFT 0
fi

log CAMPAIGN_R4F_DONE 0
