"""Benchmark: 1080p P-frame encode+decode throughput on one chip.

Measures the REAL bitstream path (device transforms + host rANS +
channel-AR slice decode loop) of the full-size P-frame codec at padded
1080p (1088x1920), the reference's headline operating point
(test_video.py HEVC-B/UVG suites, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": r}

vs_baseline uses REFERENCE_FPS = 1.0 frames/sec as the PyTorch-GPU
anchor: the reference repo publishes no speed numbers (BASELINE.md);
contemporary conditional-residual NVC implementations report ~0.5-1.5 s
per 1080p frame for encode+decode on a datacenter GPU, and the north
star in BASELINE.json is ">=10x the PyTorch baseline frames/sec per
chip" against that class of implementation.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_FPS = 1.0
H, W = 1088, 1920  # 1080p padded to x64 (test_video.py:294 protocol)


def main():
    from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables

    model = PFrameCodec(dtype=jnp.bfloat16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    rt = PFrameRuntime(model, variables)

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32)).astype(jnp.bfloat16)
    curr = jnp.clip(
        ref + 0.02 * jnp.asarray(rng.standard_normal((1, H, W, 3)).astype(np.float32)),
        0, 1,
    ).astype(jnp.bfloat16)
    sm = jnp.asarray(
        rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    feature = None

    # warmup (compile both branches of the chain)
    mv_bs, res_bs = rt.compress(ref, curr, sm, feature)
    out = rt.decompress(ref, mv_bs, res_bs, sm, feature)
    jax.block_until_ready(out["recon"])
    feature0 = out["feature"]
    mv_bs, res_bs = rt.compress(out["recon"], curr, sm, feature0)
    out2 = rt.decompress(out["recon"], mv_bs, res_bs, sm, feature0)
    jax.block_until_ready(out2["recon"])

    # per-frame wall times; median is robust to shared-environment noise
    n = 8
    times = []
    ref_f, feat_f = out["recon"], feature0
    for _ in range(n):
        t0 = time.perf_counter()
        mv_bs, res_bs = rt.compress(ref_f, curr, sm, feat_f)
        dec = rt.decompress(ref_f, mv_bs, res_bs, sm, feat_f)
        ref_f, feat_f = dec["recon"], dec["feature"]
        np.asarray(ref_f.ravel()[0])  # force completion (block is a no-op here)
        times.append(time.perf_counter() - t0)

    fps = 1.0 / float(np.median(times))

    # ---- I-frame leg: full-size ICIP2020ResB codec (N=192, M=320, 10
    # slices) per the reference protocol (test_video.py:296-334 times
    # I-frame compress/decompress every GOP) ----
    from deepsvc_tpu.models import CodecRuntime, ImageCodec

    i_model = ImageCodec(dtype=jnp.bfloat16)  # full size
    i_vars = i_model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 128, 128, 3)),
                          rng=jax.random.PRNGKey(1))
    i_rt = CodecRuntime(i_model, i_vars, encoder_xhat=False)
    x_i = ref  # the 1080p frame
    i_enc_t, i_dec_t, i_bpp = [], [], 0.0
    for it in range(3):
        t0 = time.perf_counter()
        bs = i_rt.compress(x_i)
        t1 = time.perf_counter()
        dec = i_rt.decompress(bs)
        np.asarray(dec["x_hat"].ravel()[0])
        t2 = time.perf_counter()
        if it:  # skip the compile iteration
            i_enc_t.append(t1 - t0)
            i_dec_t.append(t2 - t1)
        i_bpp = bs.num_bytes * 8.0 / (H * W)

    print(
        json.dumps(
            {
                "metric": "1080p_pframe_encode_decode_fps",
                "value": round(fps, 4),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 4),
                "i_enc_s": round(float(np.median(i_enc_t)), 4),
                "i_dec_s": round(float(np.median(i_dec_t)), 4),
                "i_bpp": round(i_bpp, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
