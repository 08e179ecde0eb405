"""RD evaluation entry point (reference: test_video.py).

Evaluates trained checkpoints over the standard test suites with real
rANS bitstreams, GOP 12, 96 frames, writing the reference's JSON schema:

    python test_video_tpu.py --dataset HEVC_D --data-root /path/TestSets \
        --checkpoint-root ./checkpoints --metric mse

Without checkpoints/datasets, --smoke runs a synthetic sequence through
freshly-initialized models to validate the whole pipeline.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

# XLA compile of the full-size encoder/decoder executables costs ~10 min
# on this box's CPU; the persistent cache makes every rerun (and the
# trainer-shared programs) near-free.  Same location as main.py:22.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def get_args():
    p = argparse.ArgumentParser(description="deepsvc_tpu RD evaluation")
    p.add_argument("--dataset", type=str, default="HEVC_D")
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--checkpoint-root", type=str, default="./checkpoints")
    p.add_argument("--metric", type=str, default="mse", choices=["mse", "msssim"])
    p.add_argument("--lambdas", type=int, nargs="+", default=[80, 160, 320, 640])
    p.add_argument("--output", type=str, default="./output/testing")
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--no-semantic", action="store_true",
                   help="skip the semantic layer (structure+texture only)")
    p.add_argument("--smoke", action="store_true",
                   help="synthetic sequence + fresh models (pipeline check)")
    p.add_argument("--synthetic", action="store_true",
                   help="full-size models (+checkpoints when present) on a "
                        "synthetic moving-texture sequence — the RD proof "
                        "path when no real dataset is mounted")
    p.add_argument("--synthetic-size", type=str, default="192x320",
                   help="HxW of the synthetic sequence")
    p.add_argument("--synthetic-seed", type=int, default=7,
                   help="sequence seed; trainers use seed 16, so any other "
                        "value is held-out w.r.t. the training stream")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize pins "
                        "jax_platforms, so the JAX_PLATFORMS env var "
                        "has no effect in this environment)")
    p.add_argument("--fast", action="store_true",
                   help="evaluate the fast serving profile "
                        "(core/factory.fast_config); point "
                        "--checkpoint-root at a fast-profile root")
    return p.parse_args()


def build_runtimes(args, lam):
    """Construct runtimes, loading checkpoints when available.

    Returns (i_runtime, p_runtime, sm_runtime|None, teacher_apply|None).
    """
    import jax
    import jax.numpy as jnp

    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import (
        build_image_codec,
        build_pframe_codec,
        build_student,
        build_teacher,
        fast_config,
        tiny_config,
    )
    from deepsvc_tpu.models import (
        CodecRuntime,
        PFrameRuntime,
        init_pframe_variables,
    )
    from deepsvc_tpu.models.semantic_runtime import SemanticRuntime

    tiny = args.smoke and not getattr(args, "synthetic", False)
    cfg = tiny_config() if tiny else DeepSVCConfig()
    if getattr(args, "fast", False):
        cfg = fast_config(cfg)
    i_model = build_image_codec(cfg)
    p_model = build_pframe_codec(cfg)

    x = jnp.zeros((1, 64, 64, 3))
    i_vars = i_model.init({"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1))
    p_vars = init_pframe_variables(p_model, jax.random.PRNGKey(0), H=64, W=64)

    # Checkpoint contract: trainers save a full TrainState (step/params/
    # opt_state/rng) via main.py under <root>/<metric>_<lam>/checkpoints;
    # eval restores that exact layout and extracts params.
    def _restore_params(run_dir, template_vars):
        from deepsvc_tpu.train import TrainState, make_optimizer
        from deepsvc_tpu.utils.checkpoint import CheckpointManager

        ckpt_dir = os.path.join(run_dir, "checkpoints")
        if not os.path.isdir(ckpt_dir):
            ckpt_dir = run_dir  # tolerate pointing directly at the manager dir
        if not os.path.isdir(ckpt_dir):
            return None, None
        tx = make_optimizer(template_vars)
        template = TrainState.create(template_vars, tx, jax.random.PRNGKey(0))
        mgr = CheckpointManager(ckpt_dir)
        restored, step = mgr.restore(template)
        if restored is None:
            return None, None
        return restored.params, step

    p_run = os.path.join(args.checkpoint_root, f"{args.metric}_{lam}")
    if os.path.isdir(p_run):
        loaded, step = _restore_params(p_run, p_vars)
        if loaded is not None:
            p_vars = loaded
            print(f"loaded P-frame checkpoint step {step} from {p_run}")

    i_run = os.path.join(args.checkpoint_root, f"image_{args.metric}_{lam}")
    if os.path.isdir(i_run):
        loaded, step = _restore_params(i_run, i_vars)
        if loaded is not None:
            i_vars = loaded
            print(f"loaded I-codec checkpoint step {step} from {i_run}")

    sm_rt = None
    teacher_apply = None
    if not args.no_semantic:
        # semantic layer: teacher + student, from checkpoints when present
        depth = 26 if tiny else 50
        teacher = build_teacher(cfg, depth=depth)
        t_vars = teacher.init(jax.random.PRNGKey(0), x)
        student = build_student(cfg, depth=depth)
        supp0 = jnp.zeros((2, 1, 16, 16, 256))
        s_vars = student.init(
            {"params": jax.random.PRNGKey(0)}, x, supp0, rng=jax.random.PRNGKey(1)
        )
        sem_dir = os.path.join(args.checkpoint_root, f"semantic_{lam}")
        restored = None
        if os.path.isdir(sem_dir):
            from deepsvc_tpu.utils.checkpoint import CheckpointManager

            mgr = CheckpointManager(sem_dir)
            restored, step = mgr.restore({"teacher": t_vars, "student": s_vars})
            if restored is not None:
                t_vars, s_vars = restored["teacher"], restored["student"]
                print(f"loaded semantic checkpoint step {step}")
        if restored is None and not tiny:
            # LOUD failure: silently zeroing the semantic feature produced
            # a "fine-tune proof" whose eval ran with the semantic layer
            # absent (smbpp=0.0, r3 post-mortem).  Structure+texture-only
            # evaluation is an explicit choice, never a fallback.
            raise FileNotFoundError(
                f"no semantic checkpoint under {sem_dir} "
                f"(train_semantic_stack.py --lambda-rd {lam} writes it); "
                "pass --no-semantic to evaluate structure+texture only"
            )

        sm_rt = SemanticRuntime(student, s_vars)
        teacher_apply = jax.jit(lambda xn: teacher.apply(t_vars, xn))

    # eval never consumes the encoder-side I-frame synthesis (the decoder
    # x_hat feeds the GOP), so skip the g_s deconv stack on the encode side
    return (
        CodecRuntime(i_model, i_vars, encoder_xhat=False),
        PFrameRuntime(p_model, p_vars),
        sm_rt,
        teacher_apply,
    )


def main():
    args = get_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from deepsvc_tpu.eval import (
        TEST_DATA,
        GOPEvaluator,
        aggregate,
        write_aggregate,
        write_results,
    )

    out_dir = os.path.join(args.output, args.metric.upper(), args.dataset)
    os.makedirs(out_dir, exist_ok=True)

    from deepsvc_tpu.core.config import DeepSVCConfig

    cfg = DeepSVCConfig()
    per_lambda_outputs = []
    for lam in args.lambdas:
        i_rt, p_rt, sm_rt, teacher_apply = build_runtimes(args, lam)
        ev = GOPEvaluator(i_rt, p_rt, sm_runtime=sm_rt,
                          teacher_apply=teacher_apply, gop=cfg.eval.gop,
                          pad_multiple=cfg.eval.pad_multiple,
                          multi_supp=cfg.semantic.multi_supp)

        per_seq = {}
        if args.synthetic:
            import numpy as np

            from deepsvc_tpu.data.synthetic import make_clip_batch

            h, w = (int(v) for v in args.synthetic_size.split("x"))
            rng = np.random.default_rng(args.synthetic_seed)
            n = min(args.frames, 96)
            # same moving-texture distribution the synthetic trainers see
            clip = make_clip_batch(rng, frames=n, batch=1, height=h, width=w)

            metrics = ev.evaluate_sequence(
                (clip[t, 0] for t in range(n)), (h, w), max_frames=n
            )
            per_seq["synthetic"] = aggregate(metrics)
        elif args.smoke:
            import numpy as np

            rng = np.random.default_rng(0)

            def synth_frames():
                base = rng.random((72, 128, 3), dtype=np.float32)
                for t in range(args.frames):
                    shift = t % 8
                    yield np.roll(base, shift, axis=1)

            metrics = ev.evaluate_sequence(synth_frames(), (72, 128),
                                           max_frames=min(args.frames, 13))
            per_seq["synthetic"] = aggregate(metrics)
        else:
            from deepsvc_tpu.data.frames import sequence_dir, sequence_frames

            info = TEST_DATA[args.dataset]
            for seq in info.sequences:
                d = sequence_dir(args.data_root, info.dir, seq,
                                 info.org_resolution, info.x64_resolution)
                h, w = (int(v) for v in info.x64_resolution.split("x")[::-1])
                metrics = ev.evaluate_sequence(
                    sequence_frames(d, args.frames), (h, w), args.frames
                )
                per_seq[seq] = aggregate(metrics)
                print(seq, json.dumps(per_seq[seq])[:200])

        # state what was actually measured: a synthetic smoke eval must
        # never read like a reference-protocol artifact (r3 weak #8)
        conditions = {
            "data": ("synthetic moving-texture" if args.synthetic
                     else "smoke" if args.smoke else args.dataset),
            "frames": int(args.frames),
            "gop": int(cfg.eval.gop),
            "lambda": int(lam),
            "semantic_layer": not args.no_semantic,
            "profile": "fast" if args.fast else "reference-shaped",
        }
        if args.synthetic:
            conditions["resolution"] = args.synthetic_size
            conditions["seed"] = int(args.synthetic_seed)
            # seed != trainers' 16 => unseen sequences, same distribution
            conditions["seed_differs_from_train"] = args.synthetic_seed != 16
        out = write_results(
            os.path.join(out_dir, f"{args.dataset}_{args.metric.upper()}_{lam}.json"),
            f"{args.dataset}_{args.metric.upper()}_{lam}",
            per_seq,
            conditions=conditions,
        )
        print(json.dumps(out)[:400])
        per_lambda_outputs.append(out)
        if args.smoke and not args.synthetic:
            break

    # across-lambda aggregate: {tgt}_{INDICATOR}.json with one list entry
    # per rate point (test_video.py:495-513)
    if per_lambda_outputs:
        agg = write_aggregate(
            os.path.join(out_dir, f"{args.dataset}_{args.metric.upper()}.json"),
            args.dataset,
            per_lambda_outputs,
        )
        print("aggregate:", json.dumps(agg)[:400])


if __name__ == "__main__":
    main()
