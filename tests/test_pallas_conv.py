"""Exactness of the pallas h2 conv kernel vs the XLA reference lowering.

Runs in interpret mode (tests are CPU-only, conftest.py); the compiled
Mosaic path is exercised on hardware by bench_hot.py / bench.py and the
runtime equality checks (encoder recon == decoder recon bitwise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.ops.packed import conv_h2
from deepsvc_tpu.ops.pallas_conv import conv3x3_h2, h2_pack_kernel3


def _mk(rng, H, W, C):
    x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
    K = jnp.asarray(
        rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05
    )
    b = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
    return x, K, b


class TestPallasConvH2:
    def test_linear_matches_conv_h2(self, rng):
        H, W, C = 24, 32, 64
        x, K, b = _mk(rng, H, W, C)
        ref = conv_h2(x, K, b, dtype=jnp.float32)
        got = conv3x3_h2(
            x.reshape(1, H, W // 2, 2 * C),
            h2_pack_kernel3(K, jnp.float32),
            jnp.tile(b, 2),
            th=8, twp=8, interpret=True,
        ).reshape(1, H, W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_row_padding_tail_tile(self, rng):
        # H=20 with th=8 exercises the zero-row padding + crop path
        H, W, C = 20, 16, 64
        x, K, b = _mk(rng, H, W, C)
        ref = conv_h2(x, K, b, dtype=jnp.float32)
        got = conv3x3_h2(
            x.reshape(1, H, W // 2, 2 * C),
            h2_pack_kernel3(K, jnp.float32),
            jnp.tile(b, 2),
            th=8, twp=8, interpret=True,
        ).reshape(1, H, W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_lrelu_residual(self, rng):
        H, W, C = 16, 16, 64
        x, K, b = _mk(rng, H, W, C)
        c = conv_h2(x, K, b, dtype=jnp.float32)
        ref = x + jnp.where(c >= 0, c, 0.01 * c)
        xp = x.reshape(1, H, W // 2, 2 * C)
        got = conv3x3_h2(
            xp, h2_pack_kernel3(K, jnp.float32), jnp.tile(b, 2), xp,
            slope=0.01, th=8, twp=8, interpret=True,
        ).reshape(1, H, W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_rejects_non_128_lanes(self, rng):
        x, K, b = _mk(rng, 8, 8, 32)
        with pytest.raises(AssertionError):
            conv3x3_h2(
                x.reshape(1, 8, 4, 64),
                h2_pack_kernel3(K, jnp.float32),
                jnp.tile(b, 2), interpret=True,
            )


from deepsvc_tpu.ops.pallas_conv import resblock_h2


def _rb_ref(x, K1, b1, K2, b2, slope, pre_act, post_act):
    act = (lambda v: jnp.maximum(v, 0.0)) if slope is None else (
        lambda v: jnp.where(v >= 0, v, slope * v))
    out = act(x) if pre_act else x
    out = act(conv_h2(out, K1, b1, dtype=jnp.float32))
    out = conv_h2(out, K2, b2, dtype=jnp.float32)
    if post_act:
        out = act(out)
    return x + out


class TestPallasResBlock:
    @pytest.mark.parametrize("pre_act,post_act,slope", [
        (True, False, 0.01), (False, False, None), (True, True, 0.2),
    ])
    def test_matches_unfused(self, rng, pre_act, post_act, slope):
        H, W, C = 24, 32, 64
        x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
        K1 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
        K2 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)
        ref = _rb_ref(x, K1, b1, K2, b2, slope, pre_act, post_act)
        got = resblock_h2(
            x.reshape(1, H, W // 2, 2 * C),
            h2_pack_kernel3(K1, jnp.float32), jnp.tile(b1, 2),
            h2_pack_kernel3(K2, jnp.float32), jnp.tile(b2, 2),
            slope=slope, pre_act=pre_act, post_act=post_act,
            th=8, twp=8, interpret=True,
        ).reshape(1, H, W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_edge_tiles_and_row_padding(self, rng):
        # H=20 (tail tile is padded rows), tiles touch all 4 image edges:
        # exercises the h-masking that reproduces unfused SAME semantics
        H, W, C = 20, 16, 64
        x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
        K1 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
        K2 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        ref = _rb_ref(x, K1, b1, K2, b2, 0.01, True, False)
        got = resblock_h2(
            x.reshape(1, H, W // 2, 2 * C),
            h2_pack_kernel3(K1, jnp.float32), jnp.tile(b1, 2),
            h2_pack_kernel3(K2, jnp.float32), jnp.tile(b2, 2),
            slope=0.01, th=8, twp=8, interpret=True,
        ).reshape(1, H, W, C)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_module_routing_param_tree_stable(self, rng):
        # ResBlock's fused path must create the identical param tree
        from deepsvc_tpu.models.layers import ResBlock
        from deepsvc_tpu.ops import pallas_conv

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 64)).astype(np.float32))
        mod = ResBlock(64, packed=True)
        v = mod.init(jax.random.PRNGKey(0), x)
        # CPU backend: active() stays False, so this exercises only that
        # enable() does not change tracing/params on the fallback path
        pallas_conv.enable(True)
        try:
            v2 = mod.init(jax.random.PRNGKey(0), x)
        finally:
            pallas_conv.enable(False)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
