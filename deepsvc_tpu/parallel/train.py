"""Data-parallel training step over a mesh.

jit over NamedSharding-annotated inputs: the batch axis is sharded over
``data``; parameters/optimizer state are replicated; XLA emits the
gradient all-reduce (psum over ICI) — no hand-written communication
layer (SURVEY.md §2.6 "TPU-native equivalent").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pframe import bpp_from_likelihoods


def make_dp_cascade_step(model, tx, mesh: Mesh, frames_n: int, lambda_rd: float,
                         mc_weight: float = 0.01, remat: bool = True):
    """Jitted multi-chip cascade update: frames (f, B, H, W, 3) with B
    sharded over the mesh's data axis.

    ``remat=False`` skips the per-frame rematerialization — memory-only
    semantics (identical grads, identical sharding/collective structure);
    compile-budget-constrained callers (the driver's 1-CPU multichip
    dryrun) use it to halve the backward compile."""

    repl = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(None, "data"))

    # remat each frame: the unrolled cascade otherwise holds every
    # frame's activations live (>=50 GB at production shapes — 3x HBM;
    # train/trainer.py _make_cascade_step, same trade)
    frame_fwd = (jax.checkpoint if remat else (lambda f: f))(
        lambda params, ref, curr, sm, feature, key: model.apply(
            params, ref, curr, sm, feature, rng=key, training=True
        )
    )

    def step(state, frames, sms):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            ref = frames[0]
            feature = None
            total = 0.0
            num = frames_n * (frames_n - 1) // 2
            num_pixels = frames.shape[1] * frames.shape[2] * frames.shape[3]
            for idx in range(1, frames_n):
                out = frame_fwd(
                    params, ref, frames[idx], sms[idx], feature,
                    jax.random.fold_in(sub, idx),
                )
                bpp = bpp_from_likelihoods(out["mv_likelihoods"], num_pixels)
                bpp += bpp_from_likelihoods(out["res_likelihoods"], num_pixels)
                mse = jnp.mean((out["recon"] - frames[idx]) ** 2)
                mc = jnp.mean((out["predict_frame"] - frames[idx]) ** 2)
                total += idx * (lambda_rd * (mse + mc_weight * mc) + bpp)
                ref = out["recon"]
                feature = out["feature"]
            aux = model.apply(params, method=model.aux_loss)
            return total / num + aux, {"loss": total / num, "aux": aux}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state, rng=rng),
            metrics,
        )

    return jax.jit(
        step,
        in_shardings=(repl, batch_sharded, batch_sharded),
        out_shardings=(repl, repl),
    )
