"""I-frame image codec training entry point.

The reference consumes externally-trained ICIP2020ResB checkpoints
(/root/reference/test_video.py:254-265); this driver makes the framework
self-contained by training deepsvc_tpu's ImageCodec with the standard
lambda * 255^2 * MSE + bpp objective (train/image_trainer.py).

    python train_image.py --lmbda 0.0483 --steps 3000 --synthetic

Checkpoints land in <log-root>/image_<metric>_<tag>/checkpoints in the
exact layout test_video_tpu.py restores.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def get_args():
    p = argparse.ArgumentParser(description="deepsvc_tpu I-codec training")
    p.add_argument("--seed", type=int, default=16)
    p.add_argument("--lmbda", type=float, default=0.0483,
                   help="I-codec lambda (RATE_POINTS i_lambda_mse values)")
    p.add_argument("--tag", type=str, default=None,
                   help="checkpoint dir suffix; defaults to the P-codec "
                        "lambda this I-lambda maps to (RATE_POINTS)")
    p.add_argument("--metric", type=str, default="mse", choices=["mse", "msssim"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--log-root", type=str, default="./output/train")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--num-slices", type=int, default=None,
                   help="override ImageCodec.num_slices (slice A/B: the "
                        "reference shape is 10, image_model.py:437)")
    p.add_argument("--max-support-slices", type=int, default=None,
                   help="override ImageCodec.max_support_slices (reference "
                        "5; TPU-native default 2 — results/slice_ab.json)")
    p.add_argument("--resume", action="store_true",
                   help="continue from this run dir's own checkpoints")
    p.add_argument("--init-from", type=str, default=None,
                   help="run dir whose checkpoints/ seeds this run's state "
                        "(rate-transfer fine-tune: new lambda or metric from "
                        "a trained point; the step counter carries over, so "
                        "--steps is ABSOLUTE — see main.py --init-from)")
    return p.parse_args()


def _tag_for_lambda(lmbda: float) -> str:
    from deepsvc_tpu.core.config import RATE_POINTS

    for p_lam, row in RATE_POINTS.items():
        if abs(row["i_lambda_mse"] - lmbda) < 1e-9:
            return str(p_lam)
    return f"{lmbda:g}"


def main():
    args = get_args()
    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import build_image_codec, tiny_config
    from deepsvc_tpu.data.synthetic import make_clip_batch
    from deepsvc_tpu.train.image_trainer import ImageCodecTrainer, ImageTrainConfig
    from deepsvc_tpu.utils import AverageMeter, setup_logger
    from deepsvc_tpu.utils.checkpoint import CheckpointManager
    from deepsvc_tpu.utils.metrics_writer import MetricsWriter

    tag = args.tag or _tag_for_lambda(args.lmbda)
    run_dir = os.path.join(args.log_root, f"image_{args.metric}_{tag}")
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger(f"train_image_{tag}", run_dir, tofile=True)
    from deepsvc_tpu.utils.watchdog import Heartbeat

    wd = Heartbeat(stale_after=900.0, probe_grace=180.0, logger=logger)
    with open(os.path.join(run_dir, "setting.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)

    tree = DeepSVCConfig()
    if args.tiny:
        tree = tiny_config(tree)
    if args.num_slices is not None:
        tree = tree.override({"image_codec.num_slices": args.num_slices})
    if args.max_support_slices is not None:
        tree = tree.override(
            {"image_codec.max_support_slices": args.max_support_slices})
    model = build_image_codec(tree)
    cfg = ImageTrainConfig(lmbda=args.lmbda, metric=args.metric,
                           lr=args.lr, seed=args.seed)
    trainer = ImageCodecTrainer(cfg, model=model,
                                init_shape=(args.crop, args.crop))
    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    resumed = False
    if args.resume:
        restored, step0 = ckpt.restore(trainer.state)
        if restored is not None:
            trainer.state = restored
            resumed = True
            logger.info(f"resumed from step {step0}")
    if not resumed and args.init_from:
        # --resume with no own checkpoint falls back to --init-from so a
        # retried fine-tune leg never silently restarts from scratch
        src = CheckpointManager(os.path.join(args.init_from, "checkpoints"))
        restored, step0 = src.restore(trainer.state)
        if restored is None:
            raise SystemExit(f"--init-from {args.init_from}: no checkpoint found")
        trainer.state = restored
        logger.info(f"initialized from {args.init_from} step {step0}")
    # the first train_batch pays the full XLA compile, which on axon runs
    # on the REMOTE host (local process idle — indistinguishable from a
    # wedge; see main.py).  Beat after restore and widen the window for
    # the first-step compile; the loop tightens to 240 s after it.
    wd.beat()
    wd.stale_after = 2700.0
    writer = MetricsWriter(os.path.join(run_dir, "summary"))
    meter = AverageMeter()
    rng = np.random.default_rng(args.seed)

    logger.info(f"start: lmbda={args.lmbda} tag={tag} batch={args.batch_size} "
                f"crop={args.crop} devices={jax.devices()}")
    for h in logger.handlers:
        h.flush()

    def batches():
        if args.synthetic or args.data_root is None:
            while True:
                # one smoothed moving-texture frame per sample
                clip = make_clip_batch(rng, frames=1, batch=args.batch_size,
                                       height=args.crop, width=args.crop)
                yield clip[0]
        else:
            from deepsvc_tpu.data.vimeo import VimeoClips, VimeoConfig

            vc = VimeoConfig(root=args.data_root, crop=args.crop, seed=args.seed)
            clips = VimeoClips(vc)
            while True:
                for clip in clips.batches(args.batch_size):
                    yield clip[0]

    # timeout(1)'s SIGTERM must not drop everything since the last
    # ckpt_every save (see main.py; r4 lost a 1235-step run this way)
    import signal

    _stop = {"now": False}
    signal.signal(signal.SIGTERM, lambda *_: _stop.__setitem__("now", True))

    for batch in batches():
        if _stop["now"]:
            logger.info("SIGTERM: saving checkpoint before exit")
            break
        t0 = time.perf_counter()
        metrics = trainer.train_batch(jnp.asarray(batch))
        step = int(trainer.state.step)
        wd.beat()
        wd.stale_after = 240.0
        dt = time.perf_counter() - t0
        meter.update(metrics["loss"])
        if step <= 10 or step % 100 == 0:
            logger.info(f"step {step} loss {meter.avg:.4f} ({dt:.2f}s/it) {metrics}")
            meter.reset()
            for h in logger.handlers:
                h.flush()
        if step % 300 == 0:
            writer.add_scalars(metrics, step, prefix="train_")
        if step % args.ckpt_every == 0:
            ckpt.save(step, trainer.state, force=True)
        if step >= args.steps:
            break

    ckpt.save(int(trainer.state.step), trainer.state, force=True)
    logger.info(f"done at step {int(trainer.state.step)}")


if __name__ == "__main__":
    main()
