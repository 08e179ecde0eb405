"""True per-stage device times (forced completion via scalar pulls)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920


def sync(x):
    """Force completion: pull one scalar."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[0])


def t(name, fn, *args, n=2):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        sync(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)
    return out


def main():
    from deepsvc_tpu.models import PFrameCodec, PFrameRuntime, init_pframe_variables
    from deepsvc_tpu.ops import warp

    model = PFrameCodec(dtype=jnp.bfloat16)
    variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=128, W=128)
    rt = PFrameRuntime(model, variables)
    v = rt.variables

    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    curr = jnp.clip(ref + 0.02, 0, 1)
    sm = jnp.asarray(rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32))
    feat = jnp.zeros((1, H, W, 64), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4)
    img64 = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32))

    # baseline: sync cost itself
    f_id = jax.jit(lambda x: x + 1)
    t("scalar-sync overhead (x+1)", f_id, jnp.zeros((8, 128)), n=5)

    t("warp 3ch", jax.jit(warp), ref, flow, n=3)
    t("warp 64ch", jax.jit(warp), img64, flow, n=3)

    mv_in = t("motion_analysis (SPyNet)", rt._motion, v, ref, curr)
    enc = t("mv encode_tpu", rt.mv_rt._encode, rt.mv_rt.variables, mv_in, None)
    mc = t("mc_stage", rt._mc, v, ref, enc["x_hat"], sm, feat)
    res_in = t("res_input", rt._res_in, v, ref, curr, mc["predict_frame"],
               mc["predict_fea"])
    t("res encode_tpu", rt.res_rt._encode, rt.res_rt.variables, res_in, None)
    t("recon_stage", rt._recon, v, ref, jnp.zeros((1, H, W, 64), jnp.bfloat16),
      mc["predict_fea"], mc["warp_fea"])


if __name__ == "__main__":
    main()
