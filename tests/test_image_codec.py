"""Image / conditional codec tests: forward path + real bitstream path.

Tiny channel configs keep CPU compile times sane; the architecture code
paths are identical to the full-size models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.models import CodecRuntime, ConditionalCodec, ImageCodec
from deepsvc_tpu.models.codec_runtime import Bitstream


def tiny_image_codec():
    return ImageCodec(N=32, M=40, num_slices=4, max_support_slices=2)


def tiny_conditional_codec(in_ch=8, out_ch=2):
    return ConditionalCodec(in_ch=in_ch, N=16, out_ch=out_ch, num_slices=4,
                            max_support_slices=2)


@pytest.fixture(scope="module")
def img_setup():
    m = tiny_image_codec()
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init(
        {"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1)
    )
    return m, variables


class TestForward:
    def test_shapes_and_likelihoods(self, img_setup, rng):
        m, variables = img_setup
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        out = m.apply(variables, x, rng=jax.random.PRNGKey(2), training=True)
        assert out["x_hat"].shape == x.shape
        assert out["likelihoods"]["y"].shape == (1, 4, 4, 40)
        assert out["likelihoods"]["z"].shape == (1, 1, 1, 32)
        lik = out["likelihoods"]
        assert float(lik["y"].min()) > 0 and float(lik["y"].max()) <= 1.0
        bpp = sum(
            float(jnp.log(l).sum() / (-np.log(2) * 64 * 64)) for l in lik.values()
        )
        assert bpp > 0

    def test_eval_mode_deterministic(self, img_setup, rng):
        m, variables = img_setup
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        o1 = m.apply(variables, x, training=False)
        o2 = m.apply(variables, x, training=False)
        np.testing.assert_array_equal(np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"]))

    @pytest.mark.slow  # 26s cold grad compile; grads covered fast by test_entropy + test_semantic refine
    def test_grads_flow(self, img_setup, rng):
        m, variables = img_setup
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

        def loss(v):
            out = m.apply(v, x, rng=jax.random.PRNGKey(3), training=True)
            mse = jnp.mean((out["x_hat"] - x) ** 2)
            bpp = sum(
                jnp.log(l).sum() / (-np.log(2) * 64 * 64)
                for l in out["likelihoods"].values()
            )
            return 255**2 * 0.01 * mse + bpp

        g = jax.grad(loss)(variables)
        flat = jax.tree_util.tree_leaves(g)
        assert any(float(jnp.abs(l).sum()) > 0 for l in flat)


class TestBitstream:
    def test_roundtrip_bit_exact(self, img_setup, rng):
        """Decoder reconstruction must EXACTLY equal the encoder-side one
        (the property the reference relies on for correctness, SURVEY §4)."""
        m, variables = img_setup
        rt = CodecRuntime(m, variables)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        bs = rt.compress(x)
        assert bs.num_bytes > 0
        out = rt.decompress(bs)
        enc_side = rt._last_encode
        np.testing.assert_array_equal(
            np.asarray(out["y_hat"]), np.asarray(enc_side["y_hat"])
        )
        np.testing.assert_array_equal(
            np.asarray(out["x_hat"]), np.asarray(enc_side["x_hat"])
        )

    def test_bpp_reasonable(self, img_setup, rng):
        m, variables = img_setup
        rt = CodecRuntime(m, variables)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        bs = rt.compress(x)
        bpp = bs.num_bytes * 8 / (64 * 64)
        assert 0 < bpp < 48  # untrained model: loose sanity bound

    def test_container_roundtrip(self, img_setup, rng):
        m, variables = img_setup
        rt = CodecRuntime(m, variables)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        bs = rt.compress(x)
        bs2 = Bitstream.frombytes(bs.tobytes())
        assert bs2.y_string == bs.y_string
        assert bs2.z_string == bs.z_string
        assert bs2.z_shape == bs.z_shape and bs2.y_shape == bs.y_shape
        out = rt.decompress(bs2)
        np.testing.assert_array_equal(
            np.asarray(out["y_hat"]), np.asarray(rt._last_encode["y_hat"])
        )

    def test_overflow_branch_roundtrips(self, img_setup, rng):
        """|symbol| > 127 forces finish_compress off the packed-int8 fast
        path onto the exact-int16 pull; that branch must stay bit-exact
        (ADVICE r2 #5: it had no coverage).  An untrained codec fed a
        large-amplitude input guarantees out-of-int8 residuals."""
        m, variables = img_setup
        rt = CodecRuntime(m, variables)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32)) * 500.0
        out = rt.start_compress(x)
        buf = np.asarray(out["y_packed"])
        n = (buf.size - 4) // 2
        assert int(buf[2 * n:].view(np.int32)[0]) > 0, (
            "test setup failed to force an out-of-int8 symbol"
        )
        assert int(np.abs(np.asarray(out["y_sym"])).max()) > 127
        bs = rt.finish_compress(out)
        dec = rt.decompress(bs)
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(rt._last_encode["y_hat"])
        )

    def test_y_indivisible_by_4_roundtrips(self, img_setup, rng):
        """80x80 input -> y 5x5, z 2x2: y != z*4.  The bitstream must
        carry the TRUE y shape (ADVICE r2 #1: deriving it as z*4
        silently corrupted every decode at pad multiples < 64)."""
        m, variables = img_setup
        rt = CodecRuntime(m, variables)
        x = jnp.asarray(rng.random((1, 80, 80, 3), dtype=np.float32))
        bs = rt.compress(x)
        assert bs.y_shape == (5, 5)
        dec = rt.decompress(bs)
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(rt._last_encode["y_hat"])
        )

    def test_forward_bpp_predicts_real_bpp(self, img_setup, rng):
        """Estimated bits (likelihoods) ~ actual coded bits (within ~10%)."""
        m, variables = img_setup
        rt = CodecRuntime(m, variables)
        x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
        out = m.apply(variables, x, training=False)
        est_bits = sum(
            float(jnp.log2(l).sum()) * -1 for l in out["likelihoods"].values()
        )
        bs = rt.compress(x)
        real_bits = bs.num_bytes * 8
        assert real_bits < est_bits * 1.15 + 256
        assert real_bits > est_bits * 0.7


class TestConditionalCodec:
    @pytest.mark.slow  # 19s cold; conditioned-bitstream fast coverage = test_semantic roundtrip_conditioned
    def test_forward_and_roundtrip(self, rng):
        m = tiny_conditional_codec()
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 8)).astype(np.float32))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1))
        out = m.apply(variables, x, rng=jax.random.PRNGKey(2), training=True)
        assert out["x_hat"].shape == (1, 64, 64, 2)

        rt = CodecRuntime(m, variables)
        bs = rt.compress(x)
        dec = rt.decompress(bs)
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(rt._last_encode["y_hat"])
        )


@pytest.mark.slow
class TestFullSizeICodec:
    def test_fullsize_roundtrip_448x256(self, rng):
        """The reference's full-size I-frame codec (ICIP2020ResB: N=192,
        M=320, 10 slices / 5 support, image_model.py:331-619) end to end
        with REAL bitstreams at a Vimeo-sized frame (VERDICT r1 item 3)."""
        from deepsvc_tpu.models import CodecRuntime, ImageCodec

        model = ImageCodec()  # N=192, M=320 defaults
        x = jnp.asarray(rng.random((1, 256, 448, 3), dtype=np.float32))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                               rng=jax.random.PRNGKey(1))
        rt = CodecRuntime(model, variables)
        bs = rt.compress(x)
        assert bs.num_bytes > 0
        dec = rt.decompress(bs)
        assert dec["x_hat"].shape == x.shape
        # encoder-side y_hat must match the decoder's bit-exactly (the
        # bitstream round trip IS the correctness check)
        np.testing.assert_array_equal(
            np.asarray(rt._last_encode["y_hat"], np.float32),
            np.asarray(dec["y_hat"], np.float32),
        )
