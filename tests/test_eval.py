"""Eval harness tests: GOP pipeline smoke, schema, BD-rate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.eval import TEST_DATA, aggregate, bd_quality, bd_rate, write_results
from deepsvc_tpu.eval.rd_eval import GOPEvaluator
from deepsvc_tpu.models import (
    CodecRuntime,
    ImageCodec,
    PFrameCodec,
    PFrameRuntime,
    init_pframe_variables,
)


class TestBDRate:
    def test_identical_curves_zero(self):
        rate = [0.1, 0.2, 0.4, 0.8]
        q = [30, 33, 36, 39]
        assert abs(bd_rate(rate, q, rate, q)) < 1e-9
        assert abs(bd_quality(rate, q, rate, q)) < 1e-9

    def test_better_codec_negative(self):
        rate_a = [0.1, 0.2, 0.4, 0.8]
        q = [30, 33, 36, 39]
        rate_b = [r * 0.9 for r in rate_a]  # 10% cheaper at equal quality
        assert abs(bd_rate(rate_a, q, rate_b, q) + 10.0) < 0.5
        assert bd_quality(rate_a, q, rate_b, q) > 0


class TestRegistry:
    def test_reference_suites_present(self):
        assert set(TEST_DATA) == {
            "HEVC_B", "HEVC_C", "HEVC_D", "HEVC_E", "UVG", "VTL", "MCL-JCV"
        }
        assert len(TEST_DATA["UVG"].sequences) == 7
        assert len(TEST_DATA["MCL-JCV"].sequences) == 30
        assert TEST_DATA["HEVC_B"].gop == 12 and TEST_DATA["HEVC_B"].frames == 96


class TestGOPPipeline:
    @pytest.mark.slow
    def test_gop_sequence_smoke(self, rng, tmp_path):
        """I+P chain over a tiny synthetic sequence with real bitstreams."""
        i_model = ImageCodec(N=32, M=40, num_slices=4, max_support_slices=2)
        x0 = jnp.zeros((1, 64, 64, 3))
        i_vars = i_model.init(
            {"params": jax.random.PRNGKey(0)}, x0, rng=jax.random.PRNGKey(1)
        )
        p_model = PFrameCodec(mv_latent=16, res_latent=16)
        p_vars = init_pframe_variables(p_model, jax.random.PRNGKey(0), H=64, W=64)

        ev = GOPEvaluator(
            CodecRuntime(i_model, i_vars), PFrameRuntime(p_model, p_vars), gop=3
        )

        base = rng.random((60, 60, 3)).astype(np.float32)

        def frames():
            for t in range(5):
                yield np.roll(base, t, axis=1)

        metrics = ev.evaluate_sequence(frames(), (60, 60), max_frames=5)
        assert len(metrics) == 5
        assert metrics[0].kind == "I" and metrics[1].kind == "P"
        assert metrics[3].kind == "I"  # gop=3 refresh
        for m in metrics:
            assert np.isfinite(m.psnr) and m.bpp > 0

        agg = aggregate(metrics)
        for key in ("psnr", "bpp", "msssim", "ipsnr", "pbpp", "mvbpp",
                    "resbpp", "bpp2l", "ent", "dec"):
            assert key in agg
        out = write_results(str(tmp_path / "r.json"), "test", {"seq": agg})
        assert out["results"]["psnr"]
