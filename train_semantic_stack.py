"""Semantic-stack trainer: distillation + rate (reference step for the
semantic layer).

The reference trains the student backbone (feature codec + ResNet stages
2-4) inside detection training: RPN/ROI losses x beta + stage-4
distillation against the frozen teacher x fea_mse + bpp + entropy aux
(/root/reference/temporal_roi_align.py:147-401).  This entry point trains
the same student stack with the same distillation + rate surface, minus
the detection heads (detect/train_loop.py owns that composite); an extra
stage-1 distillation term constrains the *decoded* feature directly,
since that feature conditions the P-codec's motion compensation
(video_model.py:30,44) and, without detection gradients, stage-4-only
distillation leaves it underdetermined.

Checkpoints land as {"teacher": vars, "student": vars} under
<log-root>/semantic_<lambda> — exactly the layout test_video_tpu.py and
train_semantic.py restore.

    python train_semantic_stack.py --lambda-rd 320 --synthetic --steps 800
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
    p = argparse.ArgumentParser(description="semantic stack training")
    p.add_argument("--seed", type=int, default=16)
    p.add_argument("--lambda-rd", type=int, default=320,
                   choices=[80, 160, 320, 640, 1280])
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--frames", type=int, default=3,
                   help="clip length: frame 0 seeds the support FIFO, the "
                        "rest train the student (>=3 exercises the rolled "
                        "support)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--aux-lr", type=float, default=1e-3)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--ckpt-every", type=int, default=200)
    p.add_argument("--log-root", type=str, default="./output/train")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="continue from this run dir's latest checkpoint "
                        "(teacher AND student restored; --steps is ABSOLUTE, "
                        "same semantics as main.py --init-from)")
    p.add_argument("--init-from", type=str, default=None,
                   help="semantic_<lambda> run dir whose checkpoint seeds "
                        "this run (rate-transfer fine-tune: teacher AND "
                        "student carry over, the new lambda's fea weight "
                        "applies; step carries over so --steps is ABSOLUTE)")
    return p.parse_args()


def main():
    args = get_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax

    from deepsvc_tpu.core.config import RATE_POINTS, DeepSVCConfig
    from deepsvc_tpu.core.factory import build_student, build_teacher, tiny_config
    from deepsvc_tpu.core.image import Normalizer
    from deepsvc_tpu.data import make_clip_batch
    from deepsvc_tpu.train import TrainState
    from deepsvc_tpu.train.optim import label_params
    from deepsvc_tpu.utils import AverageMeter, setup_logger
    from deepsvc_tpu.utils.checkpoint import CheckpointManager
    from deepsvc_tpu.utils.metrics_writer import MetricsWriter
    from deepsvc_tpu.utils.retry import retry_transient

    fea_w = float(RATE_POINTS[args.lambda_rd]["fea_mse"])
    run_dir = os.path.join(args.log_root, f"semantic_{args.lambda_rd}")
    os.makedirs(run_dir, exist_ok=True)
    logger = setup_logger(f"semstack_{args.lambda_rd}", run_dir, tofile=True)
    from deepsvc_tpu.utils.watchdog import Heartbeat

    wd = Heartbeat(stale_after=900.0, probe_grace=180.0, logger=logger)
    with open(os.path.join(run_dir, "setting.json"), "w") as f:
        json.dump({**vars(args), "fea_weight": fea_w}, f, indent=2, default=str)

    tree = DeepSVCConfig()
    if args.tiny:
        tree = tiny_config(tree)
    depth = 26 if args.tiny else 50
    # out_indices=(0, 3): stage-1 (the decoded feature the P-codec
    # consumes) AND stage-4 (the reference's distillation target).  The
    # param tree is out_indices-independent (all stages always exist), so
    # eval restores these weights into its (0,)-indexed builders.
    teacher = build_teacher(tree, depth=depth).clone(out_indices=(0, 3))
    student = build_student(tree, depth=depth).clone(out_indices=(0, 3))
    norm = Normalizer()

    logger.info("initializing teacher/student (jitted init)")
    for h in logger.handlers:
        h.flush()
    B, H = args.batch_size, args.crop
    x0 = jnp.zeros((B, H, H, 3))
    supp0 = jnp.zeros((2, B, H // 4, H // 4, 256))
    # NOTE: the reference's teacher is an ImageNet-pretrained ResNet-50
    # (temporal_roi_align.py:98); no pretrained weights exist in this
    # environment (zero egress), so the teacher is a fixed random-init
    # feature extractor.  Distillation toward it is still the reference's
    # training surface: the student learns to reproduce the frozen
    # teacher's features through a real bitstream.
    t_vars = jax.jit(teacher.init)(jax.random.PRNGKey(args.seed), x0)
    s_vars = jax.jit(
        lambda r: student.init({"params": r}, x0, supp0,
                               rng=jax.random.PRNGKey(args.seed + 1))
    )(jax.random.PRNGKey(args.seed))
    jax.block_until_ready(s_vars)

    tx = optax.multi_transform(
        {
            "main": optax.chain(optax.clip(1.0), optax.adam(args.lr)),
            "aux": optax.adam(args.aux_lr),
        },
        label_params(s_vars),
    )
    state = jax.jit(
        lambda v: TrainState.create(v, tx, jax.random.PRNGKey(args.seed + 2))
    )(s_vars)
    jax.block_until_ready(state)

    f = args.frames

    @jax.jit
    def train_step(state, frames):
        """frames (f, B, H, W, 3) in [0,1]."""
        rng, sub = jax.random.split(state.rng)
        num_pixels = frames.shape[2] * frames.shape[3]

        def loss_fn(params):
            # frozen teacher on every frame; frame 0 seeds the FIFO
            t_outs = [teacher.apply(t_vars, norm(frames[t] * 255.0))
                      for t in range(f)]
            supp = jnp.stack([t_outs[0][0], t_outs[0][0]])
            total, dist1, dist4, bpp_sum = 0.0, 0.0, 0.0, 0.0
            for t in range(1, f):
                out = student.apply(
                    params, norm(frames[t] * 255.0), supp,
                    rng=jax.random.fold_in(sub, t), training=True,
                )
                s1, s4 = out["outs"]
                t1, t4 = t_outs[t]
                d1 = jnp.mean((s1 - t1) ** 2)
                d4 = jnp.mean((s4 - t4) ** 2)
                lik = out["likelihoods"]
                bpp = sum(
                    jnp.log(l).sum() / (-jnp.log(2.0) * num_pixels * frames.shape[1])
                    for l in lik.values()
                )
                total += fea_w * (d1 + d4) + bpp
                dist1 += d1
                dist4 += d4
                bpp_sum += bpp
                # roll the FIFO with the student's decoded feature; no
                # backprop through time (the reference's support entries
                # are produced under no_grad rolling windows)
                supp = jax.lax.stop_gradient(
                    jnp.concatenate([supp[1:], s1[None]], axis=0)
                )
            n = f - 1
            aux = student.apply(params, method=student.aux_loss)
            loss = total / n + aux
            return loss, {
                "loss": loss,
                "dist_s1": dist1 / n,
                "dist_s4": dist4 / n,
                "bpp": bpp_sum / n,
                "aux": aux,
            }

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=rng), metrics

    ckpt = CheckpointManager(run_dir)
    start = 0
    resumed = False
    if args.resume:
        restored, rstep = ckpt.restore({"teacher": t_vars, "student": state.params})
        if restored is not None:
            resumed = True
            # teacher must come from the checkpoint too: it is the frozen
            # distillation target, and P-codecs condition on features the
            # *saved* stack produced (optimizer moments restart — fine for
            # a schedule extension)
            t_vars = restored["teacher"]
            state = state.replace(params=restored["student"],
                                  step=jnp.asarray(rstep, jnp.int32))
            start = rstep
            logger.info(f"resumed from step {rstep}")
    if not resumed and args.init_from:
        # --resume with no own checkpoint falls back to --init-from so a
        # retried fine-tune leg never silently restarts from scratch
        src = CheckpointManager(args.init_from)
        restored, rstep = src.restore({"teacher": t_vars, "student": state.params})
        if restored is None:
            raise SystemExit(f"--init-from {args.init_from}: no checkpoint found")
        t_vars = restored["teacher"]
        state = state.replace(params=restored["student"],
                              step=jnp.asarray(rstep, jnp.int32))
        start = rstep
        logger.info(f"initialized from {args.init_from} step {rstep}")
    # first train_step pays the full XLA compile, which on axon runs on
    # the REMOTE host (local process idle — indistinguishable from a
    # wedge; see main.py).  Beat after init/restore and widen the window
    # for the first-step compile; the loop tightens to 240 s after it.
    wd.beat()
    wd.stale_after = 2700.0
    writer = MetricsWriter(os.path.join(run_dir, "summary"))
    meter = AverageMeter()
    rng = np.random.default_rng(args.seed + start)

    logger.info(
        f"start: lambda={args.lambda_rd} fea_w={fea_w} batch={B} crop={H} "
        f"frames={f} devices={jax.devices()}"
    )
    for h in logger.handlers:
        h.flush()

    def _save(step):
        # the {"teacher","student"} layout test_video_tpu.py:124-132 and
        # train_semantic.py restore
        ckpt.save(step, {"teacher": t_vars, "student": state.params})

    # timeout(1)'s SIGTERM must not drop progress since the last
    # ckpt_every save (see main.py)
    import signal

    _stop = {"now": False}
    signal.signal(signal.SIGTERM, lambda *_: _stop.__setitem__("now", True))

    last = start
    for n in range(start + 1, args.steps + 1):
        if _stop["now"]:
            logger.info("SIGTERM: saving checkpoint before exit")
            break
        frames = jnp.asarray(
            make_clip_batch(rng, frames=f, batch=B, height=H, width=H)
        )
        t0 = time.perf_counter()
        state, metrics = retry_transient(
            logger, "train_step", train_step, state, frames
        )
        meter.update(float(metrics["loss"]))
        wd.beat()
        wd.stale_after = 240.0
        dt = time.perf_counter() - t0
        if n <= 5 or n % 50 == 0:
            m_host = {k: float(v) for k, v in metrics.items()}
            logger.info(f"step {n} loss {meter.avg:.4f} ({dt:.2f}s/it) {m_host}")
            meter.reset()
            writer.add_scalars(m_host, n, prefix="train_")
            for h in logger.handlers:
                h.flush()
        if n % args.ckpt_every == 0:
            _save(n)
        last = n
    _save(last)
    logger.info(f"done at step {last}")


if __name__ == "__main__":
    main()
