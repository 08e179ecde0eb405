#!/bin/bash
# Round-4 RD campaign, part 1: the three-layer system whole (VERDICT r3
# items 2 and 4, partial).  Trains lambda in {640, 320}: P-codec (step 1),
# I-codec, SEMANTIC STACK (distillation + rate — never trained before r4),
# then the step-2 fine-tune WITH the trained semantic stack staged, then
# real-bitstream evals whose artifacts finally code semantic bits
# (smbpp > 0).
#
# Sequential: one TPU chip.  Every phase is timeout-bounded and logs its
# rc so a hang cannot eat the round and a partial run still leaves
# artifacts.
set -x
cd /root/repo
OUT=output/rd_round4
RES=results
mkdir -p $OUT

log() { echo "$1 rc=$2 $(date +%H:%M:%S)" >> $OUT/campaign.log; }

# ---- lambda = 640 ----------------------------------------------------
timeout 7200 python main.py --lambda-rd 640 --synthetic --batch-size 4 \
  --steps 3200 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 800 --log-root $OUT
log PHASE1_P640 $?

timeout 2800 python train_image.py --lmbda 0.0483 --steps 2500 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE2_I640 $?

timeout 3600 python train_semantic_stack.py --lambda-rd 640 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log PHASE3_SEM640 $?

# ---- lambda = 320 ----------------------------------------------------
timeout 7200 python main.py --lambda-rd 320 --synthetic --batch-size 4 \
  --steps 3200 --stage-steps 400,600,800,1000,1200 --val-every 1000 \
  --ckpt-every 800 --log-root $OUT
log PHASE4_P320 $?

timeout 2800 python train_image.py --lmbda 0.025 --steps 2500 --synthetic \
  --batch-size 8 --log-root $OUT
log PHASE5_I320 $?

timeout 3600 python train_semantic_stack.py --lambda-rd 320 --synthetic \
  --steps 600 --batch-size 2 --log-root $OUT
log PHASE6_SEM320 $?

# ---- step-2 fine-tune at 320 with the TRAINED semantic stack ---------
# (train_semantic.py now hard-fails if semantic_320 is absent)
timeout 3600 python train_semantic.py --lambda-rd 320 --synthetic \
  --checkpoint-root $OUT --steps 400 --batch-size 2 --log-root $OUT
log PHASE7_SEMFT320 $?

# ---- eval A: three-layer RD at 320+640, step-1 P weights -------------
# semantic stack staged => every P frame carries a semantic stream
# (smbpp > 0) consumed by the MC stage
timeout 4000 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 640 --checkpoint-root $OUT --frames 25 \
  --output $OUT/eval_3layer
log PHASE8_EVAL3L $?
cp $OUT/eval_3layer/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_3layer_320.json 2>/dev/null
cp $OUT/eval_3layer/MSE/HEVC_D/HEVC_D_MSE_640.json $RES/rd_r4_3layer_640.json 2>/dev/null
cp $OUT/eval_3layer/MSE/HEVC_D/HEVC_D_MSE.json $RES/rd_r4_3layer_agg.json 2>/dev/null

# ---- eval B: the step-2 fine-tuned model, full stack staged ----------
STAGE=$OUT/stage_semft320
mkdir -p $STAGE
ln -sfn $(pwd)/$OUT/semantic_ft_mse_320 $STAGE/mse_320
ln -sfn $(pwd)/$OUT/image_mse_320 $STAGE/image_mse_320
ln -sfn $(pwd)/$OUT/semantic_320 $STAGE/semantic_320
timeout 3000 python test_video_tpu.py --synthetic --metric mse \
  --lambdas 320 --checkpoint-root $STAGE --frames 25 \
  --output $OUT/eval_semft
log PHASE9_EVALSEMFT $?
cp $OUT/eval_semft/MSE/HEVC_D/HEVC_D_MSE_320.json $RES/rd_r4_semft_320.json 2>/dev/null

log CAMPAIGN_PART1_DONE 0
