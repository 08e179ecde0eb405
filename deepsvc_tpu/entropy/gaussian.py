"""Conditional Gaussian entropy model with a quantized scale table.

From-scratch JAX implementation of the mean-scale Gaussian conditional
used for all main latents in the reference (via its entropy-model
dependency; scale table semantics at /root/reference/image_model.py:13-19):
64 log-spaced scales in [0.11, 256]; likelihood = Gaussian CDF mass of the
rounding bin; coding uses per-scale integer CDF rows selected by
``build_indexes``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .cdf import CdfTable, build_table_from_pmfs
from .ops import add_uniform_noise, lower_bound, ste_round

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def get_scale_table(
    lo: float = SCALES_MIN, hi: float = SCALES_MAX, levels: int = SCALES_LEVELS
) -> np.ndarray:
    """64 log-spaced Gaussian scales (image_model.py:18-19)."""
    return np.exp(np.linspace(math.log(lo), math.log(hi), levels)).astype(np.float64)


def _std_cdf(x):
    """Standard normal CDF via erfc for tail accuracy."""
    return 0.5 * jax.lax.erfc(-x * (1.0 / math.sqrt(2.0)))


def gaussian_likelihood(
    x: jnp.ndarray,
    scales: jnp.ndarray,
    means: jnp.ndarray | None = None,
    scale_bound: float = SCALES_MIN,
) -> jnp.ndarray:
    """P(bin) of round(x - mean) under N(0, scale^2), lower-bounded."""
    x = x.astype(jnp.float32)
    scales = lower_bound(scales.astype(jnp.float32), scale_bound)
    values = x - means.astype(jnp.float32) if means is not None else x
    values = jnp.abs(values)
    upper = _std_cdf((0.5 - values) / scales)
    lower = _std_cdf((-0.5 - values) / scales)
    return lower_bound(upper - lower, LIKELIHOOD_BOUND)


class GaussianConditional:
    """Stateless mean-scale Gaussian conditional (no learned params)."""

    def __init__(self, scale_bound: float = SCALES_MIN):
        self.scale_bound = scale_bound

    def __call__(self, x, scales, means=None, rng=None, training=True):
        """Returns (x_hat, likelihoods).

        Training: additive-noise quantization for the likelihood path
        (the caller separately STE-rounds for the decoder path, matching
        the reference's forward at image_model.py:181-183).
        """
        if training:
            if rng is None:
                raise ValueError("training=True requires rng")
            x_hat = add_uniform_noise(x.astype(jnp.float32), rng)
        else:
            if means is not None:
                x_hat = ste_round(x.astype(jnp.float32) - means) + means
            else:
                x_hat = ste_round(x.astype(jnp.float32))
        lik = gaussian_likelihood(x_hat, scales, means, self.scale_bound)
        return x_hat.astype(x.dtype), lik

    @staticmethod
    def quantize_symbols(x, means):
        """Integer symbols for coding: round(x - mean)."""
        return jnp.round(x.astype(jnp.float32) - means.astype(jnp.float32)).astype(jnp.int32)

    @staticmethod
    def dequantize(symbols, means):
        return symbols.astype(jnp.float32) + means.astype(jnp.float32)


def build_indexes(scales: jnp.ndarray, scale_table: np.ndarray | None = None) -> jnp.ndarray:
    """Smallest table index whose scale >= the given scale (bounded below)."""
    table = jnp.asarray(scale_table if scale_table is not None else get_scale_table(),
                        jnp.float32)
    s = jnp.maximum(scales.astype(jnp.float32), table[0])
    # index = #{table[i] < s} for i in [0, levels-1); equivalently
    # start at levels-1 and subtract one per table entry >= s.
    idx = jnp.full(s.shape, table.shape[0] - 1, jnp.int32)
    idx -= jnp.sum(s[..., None] <= table[:-1], axis=-1).astype(jnp.int32)
    return idx


def build_gaussian_tables(
    scale_table: np.ndarray | None = None, tail_mass: float = TAIL_MASS
) -> CdfTable:
    """Integer CDF rows, one per scale-table entry (host side, exact)."""
    table = np.asarray(scale_table if scale_table is not None else get_scale_table(),
                       np.float64)
    # half-tail quantile of the standard normal
    from scipy.stats import norm as _norm  # scipy ships with the baked env

    multiplier = -float(_norm.ppf(tail_mass / 2.0))
    pmf_center = np.ceil(table * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length)[None, :] - pmf_center[:, None]).astype(np.float64)
    upper = _norm.cdf((0.5 - samples) / table[:, None])
    lower = _norm.cdf((-0.5 - samples) / table[:, None])
    pmf = upper - lower
    for r in range(table.shape[0]):
        pmf[r, pmf_length[r]:] = 0.0
    tail = 2.0 * _norm.cdf((-0.5 - pmf_center.astype(np.float64)) / table)

    offsets = -pmf_center
    return build_table_from_pmfs(pmf, tail, pmf_length, offsets)
