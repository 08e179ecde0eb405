"""Quantization / bound primitives for entropy models.

TPU notes: entropy math is always f32 (never bf16) — CDF tables must be
bit-stable across hosts or streams become undecodable (SURVEY.md §7
"hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through gradient (identity backward)."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """max(x, bound) with a gradient that can push x back up.

    Gradient passes through iff x >= bound OR the gradient pulls x upward
    (grad < 0 in minimization convention) — the "identity_if_towards"
    rule used by learned-compression entropy models.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def quantize_ste(x: jnp.ndarray, offset: jnp.ndarray | None = None) -> jnp.ndarray:
    """STE rounding around an offset: round(x - offset) + offset."""
    if offset is None:
        return ste_round(x)
    return ste_round(x - offset) + offset


def add_uniform_noise(x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Additive U(-0.5, 0.5) noise — the training-time quantization proxy."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
