"""Factorized-prior entropy model ("entropy bottleneck").

A from-scratch JAX implementation of the non-parametric, fully factorized
density of Balle et al. (2018) used by the reference for hyper-latents
(via its entropy-model dependency; see SURVEY.md §2.5): a per-channel
monotone MLP models the cumulative distribution; likelihood of an integer
bin is the CDF difference across the bin.

Channel-last layout: inputs are (B, H, W, C); the density is per-channel.
All math f32 regardless of the surrounding compute dtype.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .cdf import CdfTable, build_table_from_pmfs
from .ops import add_uniform_noise, lower_bound, ste_round

LIKELIHOOD_BOUND = 1e-9


def logits_cumulative(matrices, biases, factors, x, *, detach_params=False):
    """Monotone per-channel MLP: x (C, 1, M) -> logits (C, 1, M).

    matrices[k]: (C, d_out, d_in); biases[k]: (C, d_out, 1);
    factors[k]: (C, d_out, 1) for all but the last layer.
    """
    out = x
    n_layers = len(matrices)
    for k in range(n_layers):
        H = matrices[k]
        b = biases[k]
        if detach_params:
            H = jax.lax.stop_gradient(H)
            b = jax.lax.stop_gradient(b)
        out = jnp.einsum("cij,cjm->cim", jax.nn.softplus(H), out) + b
        if k < n_layers - 1:
            a = factors[k]
            if detach_params:
                a = jax.lax.stop_gradient(a)
            out = out + jnp.tanh(a) * jnp.tanh(out)
    return out


def _likelihood_from_logits(matrices, biases, factors, v):
    """P(round-to-bin) for values v (C, 1, M), numerically sign-stabilized."""
    lower = logits_cumulative(matrices, biases, factors, v - 0.5)
    upper = logits_cumulative(matrices, biases, factors, v + 0.5)
    sign = -jnp.sign(lower + upper)
    sign = jax.lax.stop_gradient(sign)
    return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))


class EntropyBottleneck(nn.Module):
    """Learned factorized prior over a (B, H, W, C) latent.

    Attributes:
      channels: latent channel count C.
      filters: hidden widths of the per-channel density MLP.
      init_scale: initial support half-width of the density.
      tail_mass: probability mass assigned to the bypass tails.
    """

    channels: int
    filters: Sequence[int] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        C = self.channels
        dims = (1,) + tuple(self.filters) + (1,)
        K = len(dims) - 1
        scale = self.init_scale ** (1.0 / K)

        mats, bias, facs = [], [], []
        for k in range(K):
            init = float(np.log(np.expm1(1.0 / scale / dims[k + 1])))
            mats.append(
                self.param(f"matrix_{k}", lambda rng, s, v=init: jnp.full(s, v, jnp.float32),
                           (C, dims[k + 1], dims[k]))
            )
            bias.append(
                self.param(
                    f"bias_{k}",
                    lambda rng, s: jax.random.uniform(rng, s, jnp.float32, -0.5, 0.5),
                    (C, dims[k + 1], 1),
                )
            )
            if k < K - 1:
                facs.append(self.param(f"factor_{k}", nn.initializers.zeros, (C, dims[k + 1], 1)))
        self.matrices = mats
        self.biases = bias
        self.factors = facs

        init_q = np.tile(
            np.array([[-self.init_scale, 0.0, self.init_scale]], np.float32), (C, 1)
        )[:, None, :]
        self.quantiles = self.param("quantiles", lambda rng: jnp.asarray(init_q))

    def medians(self) -> jnp.ndarray:
        """(C,) per-channel density medians."""
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def __call__(self, x: jnp.ndarray, rng: jax.Array | None = None, training: bool = True):
        """Returns (x_hat, likelihoods), both shaped like x (B, H, W, C)."""
        B, H, W, C = x.shape
        xf = x.astype(jnp.float32)
        medians = self.medians()

        if training:
            if rng is None:
                raise ValueError("training=True requires an rng for noise quantization")
            x_hat = add_uniform_noise(xf, rng)
        else:
            x_hat = ste_round(xf - medians) + medians

        # per-channel evaluation: (C, 1, B*H*W)
        v = x_hat.reshape(-1, C).T[:, None, :]
        lik = _likelihood_from_logits(self.matrices, self.biases, self.factors, v)
        lik = lower_bound(lik, LIKELIHOOD_BOUND)
        lik = lik[:, 0, :].T.reshape(B, H, W, C)
        return x_hat.astype(x.dtype), lik

    def quantize_ste(self, x: jnp.ndarray) -> jnp.ndarray:
        """STE round-to-medians (used for the decoder-side hyper latent)."""
        medians = self.medians()
        return (ste_round(x.astype(jnp.float32) - medians) + medians).astype(x.dtype)

    def aux_loss(self) -> jnp.ndarray:
        """Quantile-fitting loss — gradients reach ONLY the quantiles.

        Drives quantiles[:, 0, 0/2] to the tail_mass/2 quantiles and
        quantiles[:, 0, 1] to the median of each channel density.
        """
        logits = logits_cumulative(
            self.matrices, self.biases, self.factors, self.quantiles, detach_params=True
        )
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t], jnp.float32)[None, None, :]
        return jnp.abs(logits - target).sum()


# ---------------------------------------------------------------------------
# Host-side CDF table construction (the reference's `update()`)
# ---------------------------------------------------------------------------


def build_bottleneck_tables(variables: dict, tail_mass: float = 1e-9) -> CdfTable:
    """Build integer CDF tables from trained EntropyBottleneck params.

    ``variables`` is the module's param dict: {"matrix_0": ..., "bias_0":
    ..., "factor_0": ..., "quantiles": ...}.  Returns one CDF row per
    channel; row index for coding = channel index.
    """
    params = {k: np.asarray(v, np.float64) for k, v in variables.items()}
    n_layers = len([k for k in params if k.startswith("matrix_")])
    matrices = [jnp.asarray(params[f"matrix_{k}"], jnp.float32) for k in range(n_layers)]
    biases = [jnp.asarray(params[f"bias_{k}"], jnp.float32) for k in range(n_layers)]
    factors = [jnp.asarray(params[f"factor_{k}"], jnp.float32) for k in range(n_layers - 1)]
    quantiles = np.asarray(params["quantiles"], np.float64)  # (C, 1, 3)

    medians = quantiles[:, 0, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int64), 0)
    maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int64), 0)
    pmf_start = medians - minima
    pmf_length = (maxima + minima + 1).astype(np.int64)
    max_length = int(pmf_length.max())

    C = medians.shape[0]
    samples = pmf_start[:, None] + np.arange(max_length)[None, :]  # (C, L)
    v = jnp.asarray(samples[:, None, :], jnp.float32)  # (C, 1, L)
    pmf = np.array(_likelihood_from_logits(matrices, biases, factors, v))[:, 0, :]

    # tail mass: everything left of sample 0 and right of the last sample
    lo = jnp.asarray((samples[:, :1] - 0.5)[:, None, :], jnp.float32)
    hi = jnp.asarray((pmf_start + pmf_length - 1 + 0.5)[:, None, None], jnp.float32)
    low_logit = np.asarray(logits_cumulative(matrices, biases, factors, lo))[:, 0, 0]
    high_logit = np.asarray(logits_cumulative(matrices, biases, factors, hi))[:, 0, 0]
    tail = _sigmoid(low_logit) + (1.0 - _sigmoid(high_logit))

    # zero out pmf beyond each row's length
    for c in range(C):
        pmf[c, pmf_length[c]:] = 0.0

    offsets = -minima
    return build_table_from_pmfs(pmf, tail, pmf_length, offsets)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))
