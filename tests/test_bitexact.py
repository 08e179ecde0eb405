"""Encoder/decoder bit-exactness of the real-bitstream path.

The encoder drives the decoder's own jitted executables over known y
(codec_runtime.start_compress / pframe_runtime._encode_exact), so every
symbol, index, and reconstructed tensor must equal the decoder's
BITWISE — not approximately.  These tests assert array_equal (exact)
across a multi-frame recurrent chain, the property that keeps the
P-frame recurrence from drifting (reference semantics:
/root/reference/video_model.py:137-151, encoder reconstructs decoder
state).

CPU here; scripts/check_bitexact_tpu.py is the on-hardware twin (TPU
convs are not bitwise-reproducible across fusion contexts, which is why
the exact path exists — the fused encode_tpu path is A/B only).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepsvc_tpu.models import (
    CodecRuntime,
    ImageCodec,
    PFrameCodec,
    PFrameRuntime,
    init_pframe_variables,
)


@pytest.fixture(scope="module")
def prt():
    import jax

    model = PFrameCodec(mv_latent=16, res_latent=16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=64, W=64)
    return PFrameRuntime(model, variables)


def _frames(n, h=64, w=64):
    rng = np.random.default_rng(3)
    return [jnp.asarray(rng.random((1, h, w, 3), np.float32)) for _ in range(n)]


def _decode(rt, ref, mv_bs, res_bs, sm, feat):
    job = rt.start_decompress(ref, mv_bs, res_bs, sm, feat)
    while not job.step():
        pass
    return job.result


@pytest.mark.slow  # 98.7s module fixture (PFrameRuntime compile) — full class is slow-lane; fast-lane pframe coverage lives in test_pframe.py
class TestPFrameBitExact:
    def test_pipelined_recon_equals_decode_bitwise_over_chain(self, prt):
        """3-frame recurrent chain: encoder-side recon/feature from
        compress_pipelined must be BITWISE the decoder's, every frame."""
        frames = _frames(4)
        sm = jnp.zeros((1, 16, 16, 256), jnp.float32)
        ref = feat = None
        ref = frames[0]
        for t in range(1, 4):
            h = prt.compress_pipelined(ref, frames[t], sm, feat)
            mv_bs, res_bs = prt.finish(h)
            dec = _decode(prt, ref, mv_bs, res_bs, sm, feat)
            np.testing.assert_array_equal(
                np.asarray(dec["recon"]), np.asarray(h["recon"])
            )
            np.testing.assert_array_equal(
                np.asarray(dec["feature"]), np.asarray(h["feature"])
            )
            ref, feat = h["recon"], h["feature"]

    def test_pumped_encode_bitwise_equals_unpumped(self, prt):
        """The pump hook (interleaving a decode job's host rounds between
        encode dispatch groups) changes dispatch ORDER only; bitstreams
        and reconstructions must equal the unpumped encode's bitwise,
        and the pumped job must decode to the encoder-side recon."""
        frames = _frames(3)
        sm = jnp.zeros((1, 16, 16, 256), jnp.float32)
        # frame 1: plain encode, start its decode job
        h1 = prt.compress_pipelined(frames[0], frames[1], sm, None)
        mv1, res1 = prt.finish(h1)
        job = prt.start_decompress(frames[0], mv1, res1, sm, None)
        # frame 2: encode WITH the pump driving frame 1's decode rounds
        h2p = prt.compress_pipelined(h1["recon"], frames[2], sm,
                                     h1["feature"], pump=job.step)
        mv2p, res2p = prt.finish(h2p)
        while not job.step():
            pass
        np.testing.assert_array_equal(
            np.asarray(job.result["recon"]), np.asarray(h1["recon"])
        )
        # reference: same frame-2 encode without any pump
        h2 = prt.compress_pipelined(h1["recon"], frames[2], sm, h1["feature"])
        mv2, res2 = prt.finish(h2)
        assert mv2p.y_string == mv2.y_string
        assert mv2p.z_string == mv2.z_string
        assert res2p.y_string == res2.y_string
        np.testing.assert_array_equal(
            np.asarray(h2p["recon"]), np.asarray(h2["recon"])
        )

    def test_serial_compress_decodes_consistently(self, prt):
        """compress() (no encoder-side recon) must produce bitstreams the
        decoder round-trips; its MV/MC state is the decoder's bitwise, so
        re-encoding from decode outputs matches compress_pipelined."""
        frames = _frames(3)
        sm = jnp.zeros((1, 16, 16, 256), jnp.float32)
        mv_bs, res_bs = prt.compress(frames[0], frames[1], sm, None)
        dec = _decode(prt, frames[0], mv_bs, res_bs, sm, None)
        h = prt.compress_pipelined(frames[0], frames[1], sm, None)
        mv_bs2, res_bs2 = prt.finish(h)
        assert mv_bs2.y_string == mv_bs.y_string
        assert mv_bs2.z_string == mv_bs.z_string
        assert res_bs2.y_string == res_bs.y_string
        np.testing.assert_array_equal(
            np.asarray(dec["recon"]), np.asarray(h["recon"])
        )

    def test_gop_interleaved_decode_bitwise_equals_sequential(self, prt):
        """decompress_gop() (all frames' entropy chains on one pull per
        round; MC/recon tails in frame order) must be BITWISE the
        sequential per-frame decode — only pull batching differs."""
        frames = _frames(4)
        sm = jnp.zeros((1, 16, 16, 256), jnp.float32)
        # encode a 3-P-frame chain with the pipelined encoder
        streams, ref, feat = [], frames[0], None
        for t in range(1, 4):
            h = prt.compress_pipelined(ref, frames[t], sm, feat)
            streams.append(prt.finish(h))
            ref, feat = h["recon"], h["feature"]
        # sequential decode chain
        seq, ref, feat = [], frames[0], None
        for mv_bs, res_bs in streams:
            dec = _decode(prt, ref, mv_bs, res_bs, sm, feat)
            seq.append(dec)
            ref, feat = dec["recon"], dec["feature"]
        # GOP-interleaved decode of the same streams
        gop = prt.decompress_gop(frames[0], streams, sm, None)
        assert len(gop) == len(seq)
        # one pull per chain round for the WHOLE gop, not per frame
        ms = prt.mv_rt.module.max_support_slices
        assert len(prt.gop_times) == ms + 1
        for s, g in zip(seq, gop):
            for k in ("recon", "feature", "warped", "predict_frame"):
                np.testing.assert_array_equal(np.asarray(s[k]), np.asarray(g[k]))


    def test_gop_job_pumped_and_light_bitwise(self, prt):
        """GOPDecodeJob driven as a pump of the NEXT GOP's encode (the
        bench gop_pipeline schedule) must produce bitwise the same recons
        as sequential decode; light mode only drops references."""
        frames = _frames(6)
        sm = jnp.zeros((1, 16, 16, 256), jnp.float32)
        streams, ref, feat = [], frames[0], None
        for t in range(1, 3):
            h = prt.compress_pipelined(ref, frames[t], sm, feat)
            streams.append(prt.finish(h))
            ref, feat = h["recon"], h["feature"]
        # sequential reference decode
        seq, r, f = [], frames[0], None
        for mv_bs, res_bs in streams:
            dec = _decode(prt, r, mv_bs, res_bs, sm, f)
            seq.append(dec)
            r, f = dec["recon"], dec["feature"]
        # pumped + light job: its rounds interleave with another encode
        job = prt.start_decompress_gop(frames[0], streams, sm, None,
                                       light=True)
        h2 = prt.compress_pipelined(ref, frames[3], sm, feat, pump=job.step)
        prt.finish(h2)
        while not job.step():
            pass
        assert len(job.result) == 2
        for s, g in zip(seq, job.result):
            np.testing.assert_array_equal(np.asarray(s["recon"]),
                                          np.asarray(g["recon"]))
        # light keeps only the final frame's feature
        assert "feature" not in job.result[0]
        np.testing.assert_array_equal(np.asarray(seq[-1]["feature"]),
                                      np.asarray(job.result[-1]["feature"]))


class TestImageCodecBitExact:
    @pytest.mark.slow  # 27s cold; fast-lane image bitexactness = test_interleaved_multistream below
    def test_encoder_xhat_equals_decode_bitwise(self):
        import jax

        m = ImageCodec(N=32, M=40, num_slices=5, max_support_slices=2)
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
        variables = jax.jit(
            lambda r: m.init({"params": r}, x, rng=jax.random.PRNGKey(1))
        )(jax.random.PRNGKey(0))
        rt = CodecRuntime(m, variables)
        out = rt.start_compress(x)
        bs = rt.finish_compress(out)
        dec = rt.decompress(bs)
        np.testing.assert_array_equal(
            np.asarray(dec["y_hat"]), np.asarray(out["y_hat"])
        )
        np.testing.assert_array_equal(
            np.asarray(dec["x_hat"]), np.asarray(out["x_hat"])
        )

    @pytest.mark.slow  # 20s cold; fast-lane runtime roundtrip exactness = TestBitstream::test_roundtrip_bit_exact
    def test_interleaved_multistream_decode_bitwise_equals_sequential(self):
        """decompress_many (all streams' chains on one pull per round)
        must be BITWISE the per-stream decode."""
        import jax

        m = ImageCodec(N=32, M=40, num_slices=5, max_support_slices=2)
        rng = np.random.default_rng(7)
        xs = [jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
              for _ in range(3)]
        variables = jax.jit(
            lambda r: m.init({"params": r}, xs[0], rng=jax.random.PRNGKey(1))
        )(jax.random.PRNGKey(0))
        rt = CodecRuntime(m, variables)
        streams = [rt.compress(x) for x in xs]
        seq = [rt.decompress(bs) for bs in streams]
        many = rt.decompress_many(streams)
        assert len(rt.many_times) == m.max_support_slices + 1
        for s, g in zip(seq, many):
            np.testing.assert_array_equal(
                np.asarray(s["x_hat"]), np.asarray(g["x_hat"])
            )
