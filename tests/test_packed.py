"""Exactness of the packed conv lowerings (ops/packed.py):

- conv_h2: horizontal (1x2) packing used inside layers.Conv — every
  packed block must compute the SAME function as its unpacked twin with
  the SAME parameters (f32; only float reassociation differs).
- space_to_depth 2x2 machinery (pack_kernel/packed_conv): kept as a
  general exact lowering, tested at the primitive level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.models.layers import (
    Conv,
    ConvBlockResidual,
    FeatureExtraction,
    Reconstruction,
    RefineNet,
    ResBlock,
    ResBottleneckBlock,
    UNet,
)
from deepsvc_tpu.ops.packed import (
    conv_h2,
    depth_to_space,
    packed_conv,
    packed_group_reduce,
    space_to_depth,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def x_of(rng, c, h=16, w=24):
    return jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))


class TestPackedPrimitives:
    def test_s2d_roundtrip(self, rng):
        x = x_of(rng, 5)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
        )

    @pytest.mark.parametrize("k", [1, 3, 5, 7])
    def test_packed_conv_exact(self, rng, k):
        cin, cout = 6, 10
        x = x_of(rng, cin)
        K = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, K, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        out = depth_to_space(packed_conv(space_to_depth(x), K, b))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k", [1, 3, 5, 7])
    def test_conv_h2_exact(self, rng, k):
        cin, cout = 6, 10
        x = x_of(rng, cin)
        K = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, K, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        out = conv_h2(x, K, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_packed_conv_segments(self, rng):
        """Packed concat of two packed tensors == conv on the true concat."""
        c1, c2, cout, k = 5, 7, 8, 3
        a = x_of(rng, c1)
        bb = x_of(rng, c2)
        K = jnp.asarray(
            rng.standard_normal((k, k, c1 + c2, cout)).astype(np.float32)
        ) * 0.2
        ref = jax.lax.conv_general_dilated(
            jnp.concatenate([a, bb], axis=-1), K, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        xp = jnp.concatenate([space_to_depth(a), space_to_depth(bb)], axis=-1)
        out = depth_to_space(packed_conv(xp, K, None, segments=(c1, c2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_group_reduce_is_maxpool(self, rng):
        from deepsvc_tpu.ops import max_pool

        x = x_of(rng, 5)
        got = packed_group_reduce(space_to_depth(x), "max")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(max_pool(x, 2, 2, 0)), rtol=1e-6
        )


def check_pair(module_cls, rng, x, *extra, **kwargs):
    """Unpacked vs packed twin, SAME params, unpacked I/O both ways."""
    mod_u = module_cls(**kwargs)
    mod_p = module_cls(packed=True, **kwargs)
    v = mod_u.init(jax.random.PRNGKey(0), x, *extra)
    return mod_u.apply(v, x, *extra), mod_p.apply(v, x, *extra)


def assert_close(u, p, tol=1e-4):
    u, p = np.asarray(u), np.asarray(p)
    scale = max(float(np.abs(u).max()), 1.0)
    assert float(np.abs(p - u).max()) < tol * scale, (
        f"maxdiff {np.abs(p - u).max():.3e} vs scale {scale:.3e}"
    )


class TestPackedBlocks:
    def test_conv(self, rng):
        u, p = check_pair(Conv, rng, x_of(rng, 6), features=10, kernel=3, stride=1)
        assert_close(u, p)

    def test_conv7(self, rng):
        u, p = check_pair(Conv, rng, x_of(rng, 8), features=16, kernel=7, stride=1)
        assert_close(u, p)

    def test_res_bottleneck(self, rng):
        u, p = check_pair(ResBottleneckBlock, rng, x_of(rng, 8), channels=8)
        assert_close(u, p)

    def test_res_block(self, rng):
        u, p = check_pair(ResBlock, rng, x_of(rng, 8), channels=8)
        assert_close(u, p)

    def test_cbr(self, rng):
        u, p = check_pair(ConvBlockResidual, rng, x_of(rng, 8), features=32)
        assert_close(u, p)

    @pytest.mark.slow  # 13s cold (largest packed chain); other packed equivalences stay fast
    def test_unet(self, rng):
        u, p = check_pair(UNet, rng, x_of(rng, 12, h=16, w=16), out_ch=32)
        assert_close(u, p, tol=5e-4)

    def test_refine_net(self, rng):
        x = x_of(rng, 2)
        ref = x_of(rng, 3)
        u, p = check_pair(RefineNet, rng, x, ref, hidden=16, out_ch=2)
        assert_close(u, p)

    def test_feature_extraction(self, rng):
        u, p = check_pair(FeatureExtraction, rng, x_of(rng, 3), nf=16)
        assert_close(u, p)

    @pytest.mark.slow  # 17.7s cold; per-block packed equivalences below stay fast
    def test_reconstruction(self, rng):
        x = x_of(rng, 24, h=16, w=16)
        mod_u = Reconstruction(channels=32, out_ch=3)
        mod_p = Reconstruction(channels=32, out_ch=3, packed=True)
        v = mod_u.init(jax.random.PRNGKey(0), x)
        vp = mod_p.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)
        fu, ru = mod_u.apply(v, x)
        fp, rp = mod_p.apply(v, x)
        assert_close(fu, fp, tol=5e-4)
        assert_close(ru, rp, tol=1e-3)


class TestDeconvPhase:
    @pytest.mark.parametrize("k", [3, 5])
    def test_matches_conv_transpose(self, rng, k):
        from deepsvc_tpu.ops.packed import deconv_phase

        for H, W, C, O in [(8, 12, 6, 10), (7, 9, 4, 4)]:
            x = jnp.asarray(rng.standard_normal((2, H, W, C)).astype(np.float32))
            K = jnp.asarray(
                rng.standard_normal((k, k, C, O)).astype(np.float32)
            ) * 0.2
            b = jnp.asarray(rng.standard_normal((O,)).astype(np.float32))
            ref = jax.lax.conv_transpose(
                x, K, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            got = deconv_phase(x, K, b)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    def test_deconv_module_phase_vs_native(self, rng):
        from deepsvc_tpu.models.layers import Deconv

        x = jnp.asarray(rng.standard_normal((1, 8, 10, 6)).astype(np.float32))
        mod_p = Deconv(12, 5, 2)
        mod_n = Deconv(12, 5, 2, phase_decomposed=False)
        v = mod_p.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(mod_p.apply(v, x)), np.asarray(mod_n.apply(v, x)),
            rtol=1e-4, atol=1e-4,
        )


class TestConvS2:
    @pytest.mark.parametrize("k", [3, 5])
    def test_matches_strided_conv(self, rng, k):
        for H, W, C, O in [(16, 24, 6, 12), (14, 18, 8, 8), (15, 20, 4, 6)]:
            x = x_of(rng, C, h=H, w=W)
            mod_u = Conv(O, k, 2)
            mod_p = Conv(O, k, 2, packed=True)
            v = mod_u.init(jax.random.PRNGKey(0), x)
            np.testing.assert_allclose(
                np.asarray(mod_p.apply(v, x)), np.asarray(mod_u.apply(v, x)),
                rtol=1e-4, atol=1e-4,
            )
