"""Phase-level wall breakdown of the real 1080p P-frame enc+dec loop."""

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
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32)).astype(jnp.bfloat16)
    curr = jnp.clip(ref + 0.02, 0, 1).astype(jnp.bfloat16)
    sm = jnp.asarray(
        rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32)
    ).astype(jnp.bfloat16)
    feature = None

    # warmup both branches
    mv_bs, res_bs = rt.compress(ref, curr, sm, feature)
    out = rt.decompress(ref, mv_bs, res_bs, sm, feature)
    jax.block_until_ready(out["recon"])
    feat = out["feature"]
    refd = out["recon"]
    mv_bs, res_bs = rt.compress(refd, curr, sm, feat)
    out = rt.decompress(refd, mv_bs, res_bs, sm, feat)
    jax.block_until_ready(out["recon"])

    for it in range(3):
        t0 = time.perf_counter()
        v = rt.variables
        mv_in = rt._motion(v, refd, curr)
        jax.block_until_ready(mv_in)
        t1 = time.perf_counter()
        mv_enc = rt.mv_rt.start_compress(mv_in)
        jax.block_until_ready(mv_enc["x_hat"])
        t2 = time.perf_counter()
        mc = rt._mc(v, refd, mv_enc["x_hat"], sm, feat)
        jax.block_until_ready(mc["predict_fea"])
        t3 = time.perf_counter()
        res_in = rt._res_in(v, refd, curr, mc["predict_frame"], mc["predict_fea"])
        res_enc = rt.res_rt.start_compress(res_in)
        jax.block_until_ready(res_enc["y_sym"])
        t4 = time.perf_counter()
        mv_bs = rt.mv_rt.finish_compress(mv_enc)
        res_bs = rt.res_rt.finish_compress(res_enc)
        t5 = time.perf_counter()

        out = rt.decompress(refd, mv_bs, res_bs, sm, feat)
        np.asarray(out["recon"].ravel()[0])
        t6 = time.perf_counter()
        print(
            f"iter{it}: motion {1e3*(t1-t0):6.1f} | mv_enc {1e3*(t2-t1):6.1f} | "
            f"mc {1e3*(t3-t2):6.1f} | res_enc {1e3*(t4-t3):6.1f} | "
            f"rans_enc {1e3*(t5-t4):6.1f} | decomp {1e3*(t6-t5):6.1f} | "
            f"TOTAL {1e3*(t6-t0):7.1f}",
            flush=True,
        )
        print("  enc timings mv:", rt.mv_rt.timings, flush=True)
        print("  dec mv steps :", [tuple(round(1e3*x,1) for x in s) for s in rt.mv_rt.timings.get("dec_steps", [])], flush=True)
        print("  dec res steps:", [tuple(round(1e3*x,1) for x in s) for s in rt.res_rt.timings.get("dec_steps", [])], flush=True)


if __name__ == "__main__":
    main()
