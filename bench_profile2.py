"""Phase-attribution profiling of the 1080p path (sync-accurate)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920


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

    # warm everything
    mv_bs, res_bs = rt.compress(ref, curr, sm, feat)
    out = rt.decompress(ref, mv_bs, res_bs, sm, feat)
    _ = np.asarray(out["recon"][0, 0, 0])

    for trial in range(2):
        t0 = time.perf_counter()
        mv_bs, res_bs = rt.compress(ref, curr, sm, feat)
        t1 = time.perf_counter()
        out = rt.decompress(ref, mv_bs, res_bs, sm, feat)
        _ = np.asarray(out["recon"][0, 0, 0])  # force completion
        t2 = time.perf_counter()
        print(f"trial {trial}: compress {t1-t0:.3f}s decompress {t2-t1:.3f}s "
              f"(mv {mv_bs.num_bytes}B res {res_bs.num_bytes}B)", flush=True)
        print("  mv enc timings:", {k: round(v, 3) for k, v in rt.mv_rt.timings.items()
                                    if not isinstance(v, list)}, flush=True)
        print("  res enc timings:", {k: round(v, 3) for k, v in rt.res_rt.timings.items()
                                     if not isinstance(v, list)}, flush=True)
        for name, r in (("mv", rt.mv_rt), ("res", rt.res_rt)):
            steps = r.timings.get("dec_steps", [])
            tot_d2h = sum(s[0] for s in steps)
            tot_rans = sum(s[1] for s in steps)
            tot_disp = sum(s[2] for s in steps)
            print(f"  {name} dec: d2h {tot_d2h:.3f}s host-rans {tot_rans:.3f}s "
                  f"dispatch+h2d {tot_disp:.3f}s ({len(steps)} steps)", flush=True)


if __name__ == "__main__":
    main()
