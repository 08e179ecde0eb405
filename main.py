"""Training entry point (reference: main.py).

Step 1 (structure+texture layers, coded key frames from the dataset):
    python main.py --lambda-rd 640 --data-root /path/to/vimeo_septuplet
Synthetic smoke run (no dataset needed):
    python main.py --synthetic --steps 20 --tiny
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the staged trainer's jitted steps take
# minutes to compile on TPU; without this every invocation recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def get_args():
    p = argparse.ArgumentParser(description="deepsvc_tpu training")
    p.add_argument("--seed", type=int, default=16)
    p.add_argument("--lambda-rd", type=int, default=640,
                   choices=[80, 160, 320, 640, 1280])
    p.add_argument("--metric", type=str, default="mse", choices=["mse", "msssim"])
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--aux-lr", type=float, default=1e-3)
    p.add_argument("--data-root", type=str, default=None,
                   help="vimeo_septuplet root (sep_trainlist.txt + sequences/)")
    p.add_argument("--log-root", type=str, default="./output/train")
    p.add_argument("--steps", type=int, default=None, help="stop after N steps")
    p.add_argument("--val-every", type=int, default=5000)
    p.add_argument("--ckpt-every", type=int, default=1000,
                   help="forced periodic checkpoint cadence (reference saves "
                        "every 5k past stage 3, Learner.py:155-156)")
    p.add_argument("--stage-steps", type=str, default=None,
                   help="comma-separated 5 stage boundaries, e.g. "
                        "'400,600,800,1000,1200' to reach the cascade band "
                        "quickly on short runs (default: reference schedule)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic clips (smoke/e2e testing)")
    p.add_argument("--tiny", action="store_true", help="tiny model config")
    p.add_argument("--fast", action="store_true",
                   help="fast serving profile (half-res flow base + MC "
                        "fusion; core/factory.fast_config).  Use a distinct "
                        "--log-root: the checkpoint is not interchangeable "
                        "with the reference-shaped profile")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init-from", type=str, default=None,
                   help="run dir whose checkpoints/ seeds this run's state "
                        "(fine-tune entry; step continues from the restored "
                        "value, so band selection follows --stage-steps)")
    p.add_argument("--run-name", type=str, default=None,
                   help="override the '<metric>_<lambda>' run-dir name so a "
                        "fine-tune does not clobber its parent run")
    p.add_argument("--mc-weight-final", type=float, default=None,
                   help="override cascade-band mc_loss weight (reference v2 "
                        "uses 0.01, Learner.py:1123; compressed schedules "
                        "need a larger pull for MC to beat plain warping)")
    p.add_argument("--cond-num-slices", type=int, default=None,
                   help="override the MV/residual codecs' num_slices "
                        "(slice A/B: reference shape 8, image_model.py:114)")
    p.add_argument("--cond-max-support-slices", type=int, default=None,
                   help="override max_support_slices (reference 4; "
                        "TPU-native default 1 — results/slice_ab.json)")
    p.add_argument("--semantic-root", type=str, default=None,
                   help="checkpoint root holding semantic_<lambda>/ (the "
                        "train_semantic_stack.py layout).  When set, P-frame "
                        "training conditions on REAL frozen-student decoded "
                        "features instead of zeros — the configuration the "
                        "eval path feeds (eval/rd_eval.py:117-134).  Training "
                        "with zeros leaves the MC fusion out of distribution "
                        "at eval time (r4: mcpsnr 14.7 vs warppsnr 23.5)")
    return p.parse_args()


def build_semantic_provider(args, logger):
    """Frozen semantic stack -> jitted clip->features fn for P training.

    Mirrors the eval protocol (eval/rd_eval.py:117-134; reference
    video_model.py:30-45 consumes the semantic layer's decoded feature):
    teacher stage-1 features of frame 0 seed a 2-entry support FIFO, then
    the frozen student's deterministic decode (training=False: rounded
    quantization, the closest in-graph proxy for the real-bitstream path)
    yields each P-frame's feature; the FIFO rolls with decoded features.
    Returns fn: (f, B, H, W, 3) [0,1] frames -> (f, B, H/4, W/4, 256)
    (slot 0 is zeros — frame 0 is the I-frame, never coded by the P path).
    """
    import flax.linen as nn

    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import (
        build_student,
        build_teacher,
        select_support,
    )
    from deepsvc_tpu.core.image import Normalizer
    from deepsvc_tpu.utils.checkpoint import CheckpointManager

    tree = DeepSVCConfig()
    teacher = build_teacher(tree, depth=50)
    student = build_student(tree, depth=50)
    x0 = jnp.zeros((1, 64, 64, 3))
    supp0 = jnp.zeros((2, 1, 16, 16, 256))
    t_vars = jax.jit(teacher.init)(jax.random.PRNGKey(0), x0)
    s_vars = jax.jit(
        lambda r: student.init({"params": r}, x0, supp0,
                               rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0))
    sem_dir = os.path.join(args.semantic_root,
                           f"semantic_{args.lambda_rd}", "checkpoints")
    if not os.path.isdir(sem_dir):
        sem_dir = os.path.join(args.semantic_root, f"semantic_{args.lambda_rd}")
    mgr = CheckpointManager(sem_dir)
    restored, sem_step = mgr.restore({"teacher": t_vars, "student": s_vars})
    if restored is None:
        raise SystemExit(
            f"--semantic-root {args.semantic_root}: no semantic_"
            f"{args.lambda_rd} checkpoint (train_semantic_stack.py writes it)"
        )
    t_vars, s_vars = restored["teacher"], restored["student"]
    logger.info(f"semantic stack loaded from {sem_dir} (step {sem_step})")
    norm = Normalizer()
    multi = tree.semantic.multi_supp

    def _fea(m, x, supp_sel):
        # codec decode conditioned on the latest support + SELSA-style
        # aggregation — exactly what SemanticRuntime.encode_decode +
        # post_decode produce, minus the rANS round trip
        out = m.layer1(x, supp_sel[-1], training=False)
        return nn.relu(m.refine(out["x_hat"], supp_sel))

    def sm_for_clip(frames):
        f = frames.shape[0]
        smi = teacher.apply(t_vars, norm(frames[0] * 255.0))[0]
        supp = jnp.stack([smi, smi])
        sms = [jnp.zeros_like(smi)]
        for t in range(1, f):
            fea = student.apply(
                s_vars, norm(frames[t] * 255.0),
                select_support(supp, multi), method=_fea,
            )
            sms.append(fea)
            supp = jnp.concatenate([supp[1:], fea[None]], axis=0)
        return jnp.stack(sms)

    return jax.jit(sm_for_clip)


def main():
    args = get_args()
    from deepsvc_tpu.core.config import TrainConfig
    from deepsvc_tpu.data import make_clip_batch, make_semantic_features
    from deepsvc_tpu.train import PFrameTrainer
    from deepsvc_tpu.utils import AverageMeter, setup_logger
    from deepsvc_tpu.utils.checkpoint import CheckpointManager
    from deepsvc_tpu.utils.metrics_writer import MetricsWriter

    cfg = TrainConfig(
        seed=args.seed,
        batch_size=args.batch_size,
        lr=args.lr,
        aux_lr=args.aux_lr,
        lambda_rd=args.lambda_rd,
        metric=args.metric,
        crop=args.crop,
    )
    if args.stage_steps:
        bounds = tuple(int(v) for v in args.stage_steps.split(","))
        assert len(bounds) == 5, "--stage-steps needs 5 comma-separated ints"
        cfg = cfg.replace(stage_steps=bounds)
    if args.mc_weight_final is not None:
        cfg = cfg.replace(mc_weight_final=args.mc_weight_final)
    run_name = args.run_name or f"{args.metric}_{args.lambda_rd}"
    run_dir = os.path.join(args.log_root, run_name)
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger("train", run_dir, tofile=True)
    # tunnel-wedge watchdog, armed through init/restore/compile too: a
    # stalled phase with frozen process CPU means the axon client
    # deadlocked (three r5 runs froze in futex_wait — twice right after
    # restore, once mid-training); exit 17 so the campaign wrapper reruns
    # with --resume (utils/watchdog.py; compiles are safe: they burn CPU)
    from deepsvc_tpu.utils.watchdog import Heartbeat

    # init/restore legitimately spend minutes in low-CPU device waits
    # (jitted init + ~200 MB host-template pull through the tunnel), so
    # start loose; the train loop tightens to 240 s at the first step
    wd = Heartbeat(stale_after=900.0, probe_grace=180.0, logger=logger)
    with open(os.path.join(run_dir, "setting.json"), "w") as f:
        json.dump({**vars(args), "config": cfg.to_dict()}, f, indent=2, default=str)

    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import build_pframe_codec, fast_config, tiny_config

    tree = DeepSVCConfig(train=cfg)
    if args.tiny:
        tree = tiny_config(tree)
    if args.fast:
        tree = fast_config(tree)
    model = build_pframe_codec(tree)
    if args.cond_num_slices is not None or args.cond_max_support_slices is not None:
        model = model.clone(
            cond_num_slices=args.cond_num_slices,
            cond_max_support_slices=args.cond_max_support_slices,
        )
    logger.info("building trainer (jitted init compile; minutes on cold cache)")
    for h in logger.handlers:
        h.flush()
    trainer = PFrameTrainer(cfg, model=model, init_shape=(args.crop, args.crop))
    ckpt = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    resumed = False
    if args.resume:
        restored, step = ckpt.restore(trainer.state)
        if restored is not None:
            trainer.state = restored
            resumed = True
            logger.info(f"resumed from step {step}")
        wd.beat()
    if not resumed and args.init_from:
        # --resume with no own checkpoint falls through here, so a
        # wedged first attempt of a fine-tune leg retried with --resume
        # still seeds from --init-from instead of silently starting
        # from scratch (ADVICE r5 #1's retry-leg failure mode)
        src = CheckpointManager(os.path.join(args.init_from, "checkpoints"))
        restored, step = src.restore(trainer.state)
        if restored is None:
            raise SystemExit(f"--init-from {args.init_from}: no checkpoint found")
        trainer.state = restored
        logger.info(f"initialized from {args.init_from} step {step}")
        wd.beat()

    meter = AverageMeter()
    writer = MetricsWriter(os.path.join(run_dir, "summary"))
    rng = np.random.default_rng(args.seed)
    best_val_loss = float("inf")

    def batches():
        if args.synthetic or args.data_root is None:
            while True:
                yield make_clip_batch(
                    rng, frames=7, batch=args.batch_size,
                    height=args.crop, width=args.crop,
                )
        else:
            from deepsvc_tpu.data.vimeo import VimeoClips, VimeoConfig, qp_for_lambda

            vc = VimeoConfig(
                root=args.data_root,
                model_type="PSNR" if args.metric == "mse" else "MSSSIM",
                qp=qp_for_lambda(args.lambda_rd),
                crop=args.crop,
                seed=args.seed,
            )
            clips = VimeoClips(vc)
            while True:
                yield from clips.batches(args.batch_size)

    def val_batches():
        """Held-out validation source (reference sep_testlist.txt valid set,
        Learner.py:398-494) — never the current training batch."""
        if args.synthetic or args.data_root is None:
            vrng = np.random.default_rng(12345)
            while True:
                yield make_clip_batch(
                    vrng, frames=7, batch=args.batch_size,
                    height=args.crop, width=args.crop,
                )
        else:
            from deepsvc_tpu.data.vimeo import VimeoClips, VimeoConfig, qp_for_lambda

            vc = VimeoConfig(
                root=args.data_root, split="test",
                model_type="PSNR" if args.metric == "mse" else "MSSSIM",
                qp=qp_for_lambda(args.lambda_rd),
                crop=args.crop, seed=12345,
            )
            clips = VimeoClips(vc)
            while True:
                yield from clips.batches(args.batch_size)

    # step increments by frames-1 per batch in the per-frame bands, so exact
    # `step % N` tests can never fire; trigger on threshold *crossings*.
    val_iter = val_batches()
    prev_step = int(trainer.state.step)

    # tunnel drops mid-compile are transient — never lose a run to one
    from deepsvc_tpu.utils.retry import retry_transient as _retry

    def retry_transient(what, fn, *a, **kw):
        return _retry(logger, what, fn, *a, **kw)

    def crossed(period: int, lo: int, hi: int) -> bool:
        return lo // period != hi // period

    # round-2's run died during first-step compile leaving a 0-byte log
    # (nothing logged before step 100); log startup + every early step so
    # a killed run still shows how far it got, and flush each record.
    from deepsvc_tpu.train.trainer import stage_info

    logger.info(
        f"start: lambda={args.lambda_rd} metric={args.metric} "
        f"batch={args.batch_size} crop={args.crop} "
        f"stage_steps={cfg.stage_steps} devices={jax.devices()}"
    )
    for h in logger.handlers:
        h.flush()
    prev_band = None
    sms = None
    sm_fn = None
    if args.semantic_root:
        logger.info("building frozen semantic provider (teacher+student init)")
        for h in logger.handlers:
            h.flush()
        sm_fn = build_semantic_provider(args, logger)
        wd.beat()
    # The first train_batch pays the band's full XLA compile.  On axon the
    # backend compile runs on the REMOTE host: the local process sleeps at
    # ~0 CPU, so the watchdog's CPU-progress defense cannot tell it from a
    # wedge (r5: a healthy band-5 cold compile was killed at stale 1087s,
    # and every retry re-paid — and re-lost — the same compile).  Phase
    # beats above cover init/restore; widen the window for the one
    # unavoidable silent phase, the first-step compile; the loop tightens
    # to 240 s as soon as that step completes.
    wd.beat()
    wd.stale_after = 2700.0
    # `timeout N python main.py ...` sends SIGTERM at the bound; without
    # a handler that kill drops everything since the last ckpt_every save
    # (r4: the 1400-step lambda-640 run died at step ~1235 leaving only
    # the step-700 checkpoint).  Finish the in-flight step, save, exit.
    import signal

    _stop = {"now": False}
    signal.signal(signal.SIGTERM, lambda *_: _stop.__setitem__("now", True))

    for batch in batches():
        if _stop["now"]:
            logger.info("SIGTERM: saving checkpoint before exit")
            break
        frames = jnp.asarray(batch)
        if sm_fn is not None:
            # real frozen-student features, recomputed per batch (the
            # whole provider is one jitted device program)
            sms = retry_transient("semantic_features", sm_fn, frames)
        elif sms is None or sms.shape[:2] != frames.shape[:2]:
            # constant zeros (no semantic layer in step 1); allocate once —
            # re-uploading 20+ MB per step would dominate the step time
            sms = jnp.zeros(
                (frames.shape[0], frames.shape[1],
                 args.crop // 4, args.crop // 4, 256),
                jnp.float32,
            )
        band = stage_info(prev_step, cfg).band
        if band != prev_band:
            logger.info(f"entering band {band} at step {prev_step} "
                        f"(compiling — first iteration will be slow)")
            for h in logger.handlers:
                h.flush()
            prev_band = band
            # A band switch is a NEW jitted program (different unroll /
            # loss), so its first iteration re-pays a full remote compile
            # — the same silent ~0-CPU phase as startup (r5 observed
            # >1000 s for the band-5 cascade).  Widen the window for
            # exactly that step; steady state tightens it back to 240 s
            # right after train_batch.  (ADVICE r5 #1)
            wd.beat()
            wd.stale_after = 2700.0
        t_step = time.perf_counter()
        metrics = retry_transient("train_batch", trainer.train_batch, frames, sms)
        meter.update(float(metrics["loss"]))
        wd.beat()
        wd.stale_after = 240.0  # steady state: steps are seconds apart
        step = int(trainer.state.step)
        step_s = time.perf_counter() - t_step
        if prev_step < 10 or crossed(100, prev_step, step):
            m_host = {k: float(v) for k, v in metrics.items()}
            logger.info(
                f"step {step} loss {meter.avg:.4f} ({step_s:.2f}s/it) {m_host}"
            )
            meter.reset()
            for h in logger.handlers:
                h.flush()
        if crossed(300, prev_step, step):  # reference cadence (Learner.py:203-212)
            writer.add_scalars(
                {k: float(v) for k, v in metrics.items()}, step, prefix="train_"
            )
        if crossed(args.ckpt_every, prev_step, step):
            # periodic forced save so a killed run still leaves a restorable
            # checkpoint (Learner.py:155-156 role); saved BEFORE validation so
            # a validation failure can never lose training progress
            ckpt.save(step, trainer.state, force=True)
            wd.beat()
        if crossed(args.val_every, prev_step, step):
            # held-out validation + best-loss checkpointing (Learner.py:491-493);
            # non-fatal: validation uses a separate compiled graph whose first
            # compile is a fresh tunnel round trip — never let it kill the run
            try:
                val_frames = jnp.asarray(next(val_iter))
                if sm_fn is not None:
                    val_sms = sm_fn(val_frames)
                else:
                    val_sms = jnp.zeros(
                        (val_frames.shape[0], val_frames.shape[1],
                         args.crop // 4, args.crop // 4, 256),
                        jnp.float32,
                    )
                # validate_batch is its own jitted program: its first
                # call (per band) is another silent remote compile —
                # cover it like the band-transition step (ADVICE r5 #1)
                wd.beat()
                wd.stale_after = 2700.0
                val = retry_transient(
                    "validate", trainer.validate_batch, val_frames, val_sms
                )
                wd.beat()
                wd.stale_after = 240.0
                writer.add_scalars(val, step, prefix="val_")
                logger.info(f"validate @{step}: {val}")
                if val["loss"] < best_val_loss:
                    best_val_loss = val["loss"]
                    ckpt.save(step, trainer.state,
                              metrics={"val_loss": val["loss"]})
            except Exception as e:  # noqa: BLE001 — training must survive
                logger.warning(f"validation @{step} failed (continuing): {e}")
                for h in logger.handlers:
                    h.flush()
        prev_step = step
        if args.steps is not None and step >= args.steps:
            break

    ckpt.save(int(trainer.state.step), trainer.state, force=True)
    logger.info(f"done at step {int(trainer.state.step)}")


if __name__ == "__main__":
    main()
