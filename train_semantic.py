"""Semantic-layer fine-tune entry point (reference step 2).

The reference's final models come from Trainer_ICIP2020ResB_WSM_PSNRv2 /
_MSSSIMv2 (/root/reference/main.py:17, Learner.py:1117-2691): fine-tune
the structure/texture P-frame codec WITH the frozen semantic stack in
the loop — a learned I-codec codes frame 0, the frozen teacher seeds the
support FIFO, the frozen student supplies the per-P-frame semantic
feature, and training starts at the stage-5 boundary (cascade loss,
mc_weight 0.01; Learner.py:644,1123).

    python train_semantic.py --lambda-rd 320 --synthetic \
        --checkpoint-root output/rd_round3 --steps 400

--checkpoint-root restores the step-1 P-frame weights from
<root>/<metric>_<lam>/checkpoints and the trained I-codec from
<root>/image_<metric>_<lam>/checkpoints (the same layout main.py /
train_image.py write and test_video_tpu.py restores).  The fine-tuned
TrainState lands in <log-root>/semantic_ft_<metric>_<lam>/checkpoints.
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
    p = argparse.ArgumentParser(description="deepsvc_tpu semantic fine-tune")
    p.add_argument("--seed", type=int, default=16)
    p.add_argument("--lambda-rd", type=int, default=640,
                   choices=[80, 160, 320, 640, 1280])
    p.add_argument("--metric", type=str, default="mse", choices=["mse", "msssim"])
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--frames", type=int, default=5,
                   help="clip length (reference stage-5 uses f=5)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--aux-lr", type=float, default=1e-3)
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--checkpoint-root", type=str, default=None,
                   help="restore step-1 P weights + trained I-codec from "
                        "this root (main.py/train_image.py layout)")
    p.add_argument("--log-root", type=str, default="./output/train")
    p.add_argument("--steps", type=int, default=None,
                   help="stop after N optimizer steps past the stage-5 start")
    p.add_argument("--ckpt-every", type=int, default=200)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--allow-random-semantic", action="store_true",
                   help="permit fine-tuning against a randomly initialized "
                        "frozen semantic stack (normally an error: the r3 "
                        "run did this silently and its eval collapsed)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize pins "
                        "jax_platforms, so the JAX_PLATFORMS env var "
                        "has no effect in this environment)")
    return p.parse_args()


def main():
    args = get_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from deepsvc_tpu.core.config import DeepSVCConfig, TrainConfig
    from deepsvc_tpu.core.factory import (
        build_image_codec,
        build_pframe_codec,
        build_student,
        build_teacher,
        tiny_config,
    )
    from deepsvc_tpu.data import make_clip_batch
    from deepsvc_tpu.train import SemanticPFrameTrainer, TrainState, make_optimizer
    from deepsvc_tpu.utils import AverageMeter, setup_logger
    from deepsvc_tpu.utils.checkpoint import CheckpointManager
    from deepsvc_tpu.utils.metrics_writer import MetricsWriter
    from deepsvc_tpu.utils.retry import retry_transient

    cfg = TrainConfig(
        seed=args.seed,
        batch_size=args.batch_size,
        lr=args.lr,
        aux_lr=args.aux_lr,
        lambda_rd=args.lambda_rd,
        metric=args.metric,
        crop=args.crop,
    )
    run_dir = os.path.join(
        args.log_root, f"semantic_ft_{args.metric}_{args.lambda_rd}"
    )
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger(f"semft_{args.lambda_rd}", run_dir, tofile=True)
    with open(os.path.join(run_dir, "setting.json"), "w") as f:
        json.dump({**vars(args), "config": cfg.to_dict()}, f, indent=2, default=str)

    tree = DeepSVCConfig(train=cfg)
    if args.tiny:
        tree = tiny_config(tree)
    p_model = build_pframe_codec(tree)
    i_model = build_image_codec(tree)
    depth = 26 if args.tiny else 50
    teacher = build_teacher(tree, depth=depth)
    student = build_student(tree, depth=depth)

    logger.info("initializing frozen semantic stack (jitted init)")
    for h in logger.handlers:
        h.flush()
    x0 = jnp.zeros((1, 64, 64, 3))
    i_vars = jax.jit(
        lambda r: i_model.init({"params": r}, x0, rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))
    t_vars = jax.jit(teacher.init)(jax.random.PRNGKey(0), x0)
    supp0 = jnp.zeros((2, 1, 16, 16, 256))
    s_vars = jax.jit(
        lambda r: student.init({"params": r}, x0, supp0, rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))

    def _restore(run, template_vars):
        ckpt_dir = os.path.join(run, "checkpoints")
        if not os.path.isdir(ckpt_dir):
            return None, None
        tx = make_optimizer(template_vars)
        template = TrainState.create(template_vars, tx, jax.random.PRNGKey(0))
        restored, step = CheckpointManager(ckpt_dir).restore(template)
        return (restored.params, step) if restored is not None else (None, None)

    if args.checkpoint_root:
        i_run = os.path.join(
            args.checkpoint_root, f"image_{args.metric}_{args.lambda_rd}"
        )
        loaded, step = _restore(i_run, i_vars)
        if loaded is not None:
            i_vars = loaded
            logger.info(f"restored trained I-codec (step {step}) from {i_run}")

        # the TRAINED semantic stack (train_semantic_stack.py layout); the
        # r3 run silently froze a randomly-initialized stack, making the
        # fine-tune expect features the eval could never supply
        sem_dir = os.path.join(
            args.checkpoint_root, f"semantic_{args.lambda_rd}"
        )
        sem_loaded = None
        if os.path.isdir(sem_dir):
            sem_loaded, step = CheckpointManager(sem_dir).restore(
                {"teacher": t_vars, "student": s_vars}
            )
        if sem_loaded is not None:
            t_vars, s_vars = sem_loaded["teacher"], sem_loaded["student"]
            logger.info(f"restored trained semantic stack (step {step})")
        elif not args.allow_random_semantic:
            raise FileNotFoundError(
                f"no semantic checkpoint under {sem_dir} "
                f"(train_semantic_stack.py --lambda-rd {args.lambda_rd} "
                "writes it); pass --allow-random-semantic to fine-tune "
                "against a random frozen stack anyway"
            )

    logger.info("building trainer (jitted init compile)")
    for h in logger.handlers:
        h.flush()
    trainer = SemanticPFrameTrainer(
        cfg,
        p_model,
        i_codec=(i_model, i_vars),
        teacher=(teacher, t_vars),
        student=(student, s_vars),
        init_shape=(args.crop, args.crop),
    )
    if args.checkpoint_root:
        p_run = os.path.join(
            args.checkpoint_root, f"{args.metric}_{args.lambda_rd}"
        )
        loaded, step = _restore(p_run, trainer.state.params)
        if loaded is not None:
            trainer.state = trainer.state.replace(params=loaded)
            logger.info(f"restored step-1 P weights (step {step}) from {p_run}")
    # fine-tune mode: force the stage-5 start regardless of the restored
    # step (reference v2 semantics, Learner.py:1636)
    start_step = int(cfg.stage_steps[3])
    trainer.state = trainer.state.replace(
        step=jnp.asarray(start_step, jnp.int32)
    )

    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    writer = MetricsWriter(os.path.join(run_dir, "summary"))
    meter = AverageMeter()
    rng = np.random.default_rng(args.seed)

    def batches():
        if args.synthetic or args.data_root is None:
            while True:
                yield make_clip_batch(rng, frames=args.frames,
                                      batch=args.batch_size,
                                      height=args.crop, width=args.crop)
        else:
            from deepsvc_tpu.data.vimeo import VimeoClips, VimeoConfig, qp_for_lambda

            vc = VimeoConfig(
                root=args.data_root,
                model_type="PSNR" if args.metric == "mse" else "MSSSIM",
                qp=qp_for_lambda(args.lambda_rd),
                crop=args.crop,
                seed=args.seed,
                return_orgi=True,  # original + AI-coded pairing (step 2)
            )
            clips = VimeoClips(vc)
            while True:
                yield from clips.batches(args.batch_size)

    logger.info(
        f"start: lambda={args.lambda_rd} metric={args.metric} "
        f"batch={args.batch_size} crop={args.crop} frames={args.frames} "
        f"start_step={start_step} devices={jax.devices()}"
    )
    for h in logger.handlers:
        h.flush()
    n_done = 0
    # timeout(1)'s SIGTERM must not drop progress since the last
    # ckpt_every save (see main.py)
    import signal

    _stop = {"now": False}
    signal.signal(signal.SIGTERM, lambda *_: _stop.__setitem__("now", True))

    for batch in batches():
        if _stop["now"]:
            logger.info("SIGTERM: saving checkpoint before exit")
            break
        frames = jnp.asarray(batch)
        t0 = time.perf_counter()
        metrics = retry_transient(
            logger, "train_batch", trainer.train_batch, frames
        )
        step = int(trainer.state.step)
        dt = time.perf_counter() - t0
        meter.update(float(metrics["loss"]))
        n_done += 1
        if n_done <= 10 or n_done % 50 == 0:
            m_host = {k: float(v) for k, v in metrics.items()}
            logger.info(f"step {step} loss {meter.avg:.4f} ({dt:.2f}s/it) {m_host}")
            meter.reset()
            for h in logger.handlers:
                h.flush()
        if n_done % 50 == 0:
            writer.add_scalars(
                {k: float(v) for k, v in metrics.items()}, step, prefix="train_"
            )
        if n_done % args.ckpt_every == 0:
            ckpt.save(step, trainer.state, force=True)
        if args.steps is not None and n_done >= args.steps:
            break

    ckpt.save(int(trainer.state.step), trainer.state, force=True)
    logger.info(f"done after {n_done} fine-tune steps (step {int(trainer.state.step)})")


if __name__ == "__main__":
    main()
