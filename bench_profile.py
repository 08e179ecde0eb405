"""Per-stage profiling of the 1080p P-frame encode/decode path."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920


def t(fn, *args, n=3, **kw):
    fn(*args, **kw)  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables

    model = PFrameCodec(dtype=jnp.bfloat16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    rt = PFrameRuntime(model, variables)

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    curr = jnp.clip(ref + 0.02, 0, 1)
    sm = jnp.asarray(rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32))
    feat = jnp.zeros((1, H, W, 64), jnp.float32)
    v = rt.variables

    dt, mv_in = t(rt._motion, v, ref, curr)
    print(f"motion_analysis (SPyNet+cat): {dt*1e3:.1f} ms")

    dt, enc = t(rt.mv_rt._encode, rt.mv_rt.variables, mv_in, None)
    print(f"mv encode_tpu (jit):          {dt*1e3:.1f} ms")

    t0 = time.perf_counter()
    mv_bs = rt.mv_rt.compress(mv_in)
    print(f"mv compress total:            {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"({mv_bs.num_bytes} bytes)")

    t0 = time.perf_counter()
    mv_dec = rt.mv_rt.decompress(mv_bs)
    print(f"mv decompress total:          {(time.perf_counter()-t0)*1e3:.1f} ms")
    t0 = time.perf_counter()
    mv_dec = rt.mv_rt.decompress(mv_bs)
    print(f"mv decompress (2nd):          {(time.perf_counter()-t0)*1e3:.1f} ms")

    recon_mv1 = rt.mv_rt._last_encode["x_hat"]
    dt, mc = t(rt._mc, v, ref, recon_mv1, sm, feat)
    print(f"mc_stage (warp+ILP+featext):  {dt*1e3:.1f} ms")

    dt, res_in = t(rt._res_in, v, ref, curr, mc["predict_frame"], mc["predict_fea"])
    print(f"res_input:                    {dt*1e3:.1f} ms")

    dt, _ = t(rt.res_rt._encode, rt.res_rt.variables, res_in, None)
    print(f"res encode_tpu (jit):         {dt*1e3:.1f} ms")

    t0 = time.perf_counter()
    res_bs = rt.res_rt.compress(res_in)
    print(f"res compress total:           {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"({res_bs.num_bytes} bytes)")

    t0 = time.perf_counter()
    res_dec = rt.res_rt.decompress(res_bs)
    print(f"res decompress (1st):         {(time.perf_counter()-t0)*1e3:.1f} ms")
    t0 = time.perf_counter()
    res_dec = rt.res_rt.decompress(res_bs)
    print(f"res decompress (2nd):         {(time.perf_counter()-t0)*1e3:.1f} ms")

    dt, _ = t(rt._recon, v, ref, res_dec["x_hat"], mc["predict_fea"], mc["warp_fea"])
    print(f"recon_stage (enhance):        {dt*1e3:.1f} ms")

    # host coder throughput isolated
    enc_np = {k: np.asarray(val) for k, val in
              rt.res_rt._last_encode.items() if k in ("y_sym", "y_idx")}
    from deepsvc_tpu.coder import encode_with_indexes
    t0 = time.perf_counter()
    stream = encode_with_indexes(enc_np["y_sym"], enc_np["y_idx"], rt.res_rt.y_table)
    print(f"host rANS encode {enc_np['y_sym'].size} syms: "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
