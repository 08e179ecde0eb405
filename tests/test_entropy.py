"""Entropy-model + CDF-builder unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from deepsvc_tpu.entropy import (
    EntropyBottleneck,
    build_bottleneck_tables,
    build_gaussian_tables,
    build_indexes,
    gaussian_likelihood,
    get_scale_table,
    lower_bound,
    pmf_to_quantized_cdf,
    ste_round,
)


class TestQuantizedCdf:
    def test_sums_to_precision_and_monotone(self, rng):
        for _ in range(20):
            n = int(rng.integers(2, 40))
            pmf = rng.random(n)
            pmf /= pmf.sum()
            cdf = pmf_to_quantized_cdf(pmf)
            assert cdf[0] == 0 and cdf[-1] == 1 << 16
            assert np.all(np.diff(cdf) >= 1)

    def test_tiny_probabilities_get_nonzero_freq(self):
        pmf = np.array([0.999999, 1e-12, 1e-12])
        cdf = pmf_to_quantized_cdf(pmf)
        assert np.all(np.diff(cdf) >= 1)

    def test_quantization_error_small(self, rng):
        pmf = rng.random(16)
        pmf /= pmf.sum()
        cdf = pmf_to_quantized_cdf(pmf)
        q = np.diff(cdf).astype(np.float64) / (1 << 16)
        assert np.abs(q - pmf).max() < 1e-3


class TestSteRound:
    def test_value_and_grad(self):
        x = jnp.array([0.4, 0.6, -1.2])
        np.testing.assert_allclose(np.asarray(ste_round(x)), [0.0, 1.0, -1.0])
        g = jax.grad(lambda v: (ste_round(v) * 2.0).sum())(x)
        np.testing.assert_allclose(np.asarray(g), [2.0, 2.0, 2.0])


class TestLowerBound:
    def test_grad_semantics(self):
        f = lambda x: lower_bound(x, 1.0).sum()
        # above bound: gradient passes
        assert float(jax.grad(f)(jnp.array([2.0]))[0]) == 1.0
        # below bound, gradient would push down (g>0 for min of +sum): blocked
        assert float(jax.grad(f)(jnp.array([0.5]))[0]) == 0.0
        # below bound but gradient pulls up: passes
        g = jax.grad(lambda x: (-lower_bound(x, 1.0)).sum())(jnp.array([0.5]))
        assert float(g[0]) == -1.0


class TestGaussianConditional:
    def test_likelihood_matches_scipy(self, rng):
        x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32) * 3
        means = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        scales = (rng.random((2, 4, 4, 3)).astype(np.float32) * 4 + 0.2)
        got = np.asarray(gaussian_likelihood(jnp.asarray(x), jnp.asarray(scales), jnp.asarray(means)))
        v = np.abs(x - means)
        ref = norm.cdf((0.5 - v) / scales) - norm.cdf((-0.5 - v) / scales)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_build_indexes_reference_semantics(self, rng):
        table = get_scale_table()
        scales = rng.random((100,)).astype(np.float32) * 300
        idx = np.asarray(build_indexes(jnp.asarray(scales)))
        # reference loop semantics (SURVEY.md #16)
        s = np.maximum(scales, table[0])
        ref = np.full_like(idx, len(table) - 1)
        for t in table[:-1]:
            ref -= (s <= t).astype(np.int32)
        np.testing.assert_array_equal(idx, ref)
        # every chosen scale >= actual scale (or is the bound row)
        assert np.all(table[idx] >= np.minimum(s, table[-1]) - 1e-9)

    def test_gaussian_tables_consistent(self):
        table = get_scale_table()
        t = build_gaussian_tables(table)
        assert t.rows == 64
        # symbol frequencies roughly proportional to gaussian mass at center
        for r in (0, 20, 63):
            L = int(t.length[r])
            center = -int(t.offset[r])
            freqs = np.diff(t.cdf[r, :L])
            p_center = freqs[center] / (1 << 16)
            ref = norm.cdf(0.5 / table[r]) - norm.cdf(-0.5 / table[r])
            assert abs(p_center - ref) < 2e-3


class TestEntropyBottleneck:
    def _init(self, C=8):
        eb = EntropyBottleneck(channels=C)
        x = jnp.zeros((1, 4, 4, C))
        params = eb.init({"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1))
        return eb, params

    def test_forward_shapes_and_bounds(self, rng):
        eb, params = self._init()
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32) * 5)
        x_hat, lik = eb.apply(params, x, rng=jax.random.PRNGKey(2))
        assert x_hat.shape == x.shape and lik.shape == x.shape
        assert float(lik.min()) >= 1e-9 and float(lik.max()) <= 1.0
        # noise quantization stays within half a bin
        assert float(jnp.abs(x_hat - x).max()) <= 0.5 + 1e-6

    def test_eval_mode_rounds(self, rng):
        eb, params = self._init()
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32) * 5)
        x_hat, _ = eb.apply(params, x, training=False)
        med = params["params"]["quantiles"][:, 0, 1]
        np.testing.assert_allclose(
            np.asarray(x_hat), np.asarray(jnp.round(x - med) + med), atol=1e-6
        )

    def test_likelihood_integrates_to_one(self):
        # sum of bin masses over a wide integer grid ~ 1 per channel
        eb, params = self._init(C=4)
        # at init (init_scale=10) the density is heavy-tailed; integrate wide
        grid = jnp.arange(-300, 301, dtype=jnp.float32)
        x = jnp.tile(grid[None, :, None, None], (1, 1, 1, 4))
        _, lik = eb.apply(params, x, training=False)
        total = np.asarray(lik.sum(axis=(0, 1, 2)))
        np.testing.assert_allclose(total, 1.0, atol=1e-3)

    def test_aux_loss_grads_hit_only_quantiles(self):
        eb, params = self._init(C=4)

        def loss(p):
            return eb.apply(p, method=eb.aux_loss)

        g = jax.grad(loss)(params)["params"]
        assert float(jnp.abs(g["quantiles"]).sum()) > 0
        for k, v in g.items():
            if k != "quantiles":
                assert float(jnp.abs(v).sum()) == 0.0, k

    def test_table_build(self):
        eb, params = self._init(C=4)
        t = build_bottleneck_tables(params["params"])
        assert t.rows == 4
        assert np.all(t.length >= 3)
        for r in range(4):
            row = t.cdf[r, : t.length[r]]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) >= 1)
