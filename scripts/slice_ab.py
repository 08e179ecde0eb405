"""Slice-config A/B: TPU-native slice shapes vs the reference's.

The r4 perf redesign cut the channel-AR conditioning depth for decode
latency (ImageCodec 10 slices/5 support -> 10/2; ConditionalCodec 8/4 ->
4/1; reference shapes at /root/reference/image_model.py:114-146,437-438).
VERDICT r4 item 3: that cut shipped with an RD-validation claim no
committed artifact backed.  This script IS the artifact: equal-lambda,
equal-steps, equal-data likelihood-bpp + PSNR for both shapes, plus the
decode host-round count each shape costs at serve time.

    python scripts/slice_ab.py \
        --i-a output/rd_round4/image_mse_640 --i-b output/slice_ab/image_mse_refslice \
        --p-a output/rd_round4/mse_640      --p-b output/slice_ab/mse_640_refslice \
        --out results/slice_ab.json

Held-out data: synthetic moving-texture frames, seed 7 (trainers use 16).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--i-a", type=str, default=None, help="10/2 I-codec run dir")
    p.add_argument("--i-b", type=str, default=None, help="10/5 I-codec run dir")
    p.add_argument("--p-a", type=str, default=None, help="4/1 P-codec run dir")
    p.add_argument("--p-b", type=str, default=None, help="8/4 P-codec run dir")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", type=str, default="256x448")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--i-step", type=int, default=None,
                   help="restore BOTH I-codec sides at this exact step "
                        "(default: each side's latest)")
    p.add_argument("--p-step", type=int, default=None,
                   help="restore BOTH P-codec sides at this exact step")
    p.add_argument("--out", type=str, default="results/slice_ab.json")
    return p.parse_args()


def _bpp(likelihoods, num_pixels):
    import jax.numpy as jnp

    return sum(
        float(jnp.log(l).sum() / (-jnp.log(2.0) * num_pixels))
        for l in likelihoods.values()
    )


def _psnr(a, b):
    import jax.numpy as jnp

    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))


def eval_image(run_dir, num_slices, max_support, frames, step=None):
    """Deterministic (rounded) likelihood bpp + decoded PSNR, held-out."""
    import jax.numpy as jnp

    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import build_image_codec
    from deepsvc_tpu.train import TrainState, make_optimizer
    from deepsvc_tpu.utils.checkpoint import CheckpointManager

    tree = DeepSVCConfig().override({
        "image_codec.num_slices": num_slices,
        "image_codec.max_support_slices": max_support,
    })
    model = build_image_codec(tree)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0,
                           rng=jax.random.PRNGKey(1))
    tx = make_optimizer(variables)
    template = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    restored, step = CheckpointManager(ckpt_dir).restore(template, step=step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    params = restored.params

    fwd = jax.jit(lambda v, x: model.apply(v, x, training=False))
    bpps, psnrs = [], []
    for x in frames:
        out = fwd(params, x)
        num_pixels = x.shape[1] * x.shape[2]
        bpps.append(_bpp(out["likelihoods"], num_pixels))
        psnrs.append(_psnr(jnp.clip(out["x_hat"], 0, 1), x))
    return {
        "run": run_dir,
        "step": int(step),
        "num_slices": num_slices,
        "max_support_slices": max_support,
        # serve-time host rounds per latent decode (image_codec.py:320-322)
        "decode_host_rounds": max_support + 1,
        "bpp": sum(bpps) / len(bpps),
        "psnr": sum(psnrs) / len(psnrs),
    }


def eval_pframe(run_dir, num_slices, max_support, clips, step=None):
    """2-frame clip eval (ref = original frame 0, zeros semantic feature —
    matching the r4 mse_640 training configuration both variants share)."""
    import jax.numpy as jnp

    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import build_pframe_codec
    from deepsvc_tpu.models.pframe import bpp_from_likelihoods, init_pframe_variables
    from deepsvc_tpu.train import TrainState, make_optimizer
    from deepsvc_tpu.utils.checkpoint import CheckpointManager

    model = build_pframe_codec(DeepSVCConfig()).clone(
        cond_num_slices=num_slices, cond_max_support_slices=max_support
    )
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=64, W=64)
    tx = make_optimizer(variables)
    template = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    restored, step = CheckpointManager(ckpt_dir).restore(template, step=step)
    if restored is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    params = restored.params

    def _fwd(v, ref, curr, sm):
        return model.apply(v, ref, curr, sm, None, training=False)

    fwd = jax.jit(_fwd)
    bpps, psnrs = [], []
    for ref, curr in clips:
        sm = jnp.zeros((ref.shape[0], ref.shape[1] // 4, ref.shape[2] // 4, 256))
        out = fwd(params, ref, curr, sm)
        num_pixels = curr.shape[1] * curr.shape[2]
        b = bpp_from_likelihoods(out["mv_likelihoods"], num_pixels)
        b += bpp_from_likelihoods(out["res_likelihoods"], num_pixels)
        bpps.append(float(b))
        psnrs.append(_psnr(jnp.clip(out["recon"], 0, 1), curr))
    return {
        "run": run_dir,
        "step": int(step),
        "cond_num_slices": num_slices,
        "cond_max_support_slices": max_support,
        # MV+res chains interleave into shared pulls (pframe_runtime.py)
        "decode_host_rounds_per_frame": max_support + 1,
        "bpp": sum(bpps) / len(bpps),
        "psnr": sum(psnrs) / len(psnrs),
    }


def main():
    import numpy as np

    args = get_args()
    h, w = (int(v) for v in args.size.split("x"))

    from deepsvc_tpu.data.synthetic import make_clip_batch

    rng = np.random.default_rng(args.seed)
    clip = make_clip_batch(rng, frames=args.frames + 1, batch=1,
                           height=h, width=w)
    import jax.numpy as jnp

    frames = [jnp.asarray(clip[t]) for t in range(args.frames)]
    pclips = [(jnp.asarray(clip[t]), jnp.asarray(clip[t + 1]))
              for t in range(0, args.frames, 2)]

    out = {"conditions": {
        "data": "synthetic moving-texture (held-out seed)",
        "seed": args.seed, "resolution": args.size, "frames": args.frames,
        "quantization": "deterministic round (training=False) likelihoods",
    }}
    def _equal_steps(a, b, what):
        # an A/B at unequal training steps is not the experiment this
        # script's committed message claims — refuse (ADVICE r5 #2)
        if a["step"] != b["step"]:
            raise SystemExit(
                f"{what}: restored steps differ (A={a['step']} B={b['step']}); "
                f"pass --{what[0]}-step to pin both sides"
            )

    if args.i_a and args.i_b:
        a = eval_image(args.i_a, 10, 2, frames, step=args.i_step)
        b = eval_image(args.i_b, 10, 5, frames, step=args.i_step)
        _equal_steps(a, b, "image")
        out["image"] = {
            "tpu_native": a, "reference_shape": b,
            "bpp_penalty_pct": (a["bpp"] / b["bpp"] - 1.0) * 100.0,
            "psnr_delta_db": a["psnr"] - b["psnr"],
        }
    if args.p_a and args.p_b:
        a = eval_pframe(args.p_a, 4, 1, pclips, step=args.p_step)
        b = eval_pframe(args.p_b, 8, 4, pclips, step=args.p_step)
        _equal_steps(a, b, "pframe")
        out["pframe"] = {
            "tpu_native": a, "reference_shape": b,
            "bpp_penalty_pct": (a["bpp"] / b["bpp"] - 1.0) * 100.0,
            "psnr_delta_db": a["psnr"] - b["psnr"],
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
