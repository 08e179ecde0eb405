"""A/B: packed vs unpacked jitted stages at 1080p bf16."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920
SYNC = 0.0


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def t(name, fn, *args, n=4):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*args))
    print(f"{name:44s} {((time.perf_counter()-t0)/n)*1e3 - SYNC:8.1f} ms", flush=True)


def main():
    global SYNC
    from deepsvc_tpu.models.flow import MESpynet
    from deepsvc_tpu.models.layers import Reconstruction
    from deepsvc_tpu.models.pframe import InterLayerPrediction

    rng = np.random.default_rng(0)
    f_id = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128))
    sync(f_id(z))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(f_id(z))
    SYNC = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync {SYNC:.1f} ms")

    bf = jnp.bfloat16
    x3 = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32)).astype(bf)
    x64 = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32)).astype(bf)
    x128 = jnp.concatenate([x64, x64], axis=-1)
    mv = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 2).astype(bf)
    sm = jnp.asarray(
        rng.standard_normal((1, H // 4, W // 4, 256)).astype(np.float32)
    ).astype(bf)

    for pk in (False, True):
        ilp = InterLayerPrediction(dtype=bf, packed=pk)
        v = ilp.init(jax.random.PRNGKey(0), x3, x3, mv, sm, x64)
        f = jax.jit(lambda vv, a, b, c, d, e: ilp.apply(vv, a, b, c, d, e))
        t(f"ILP packed={pk}", f, v, x3, x3, mv, sm, x64)

        rec = Reconstruction(channels=64, out_ch=3, dtype=bf, packed=pk)
        vr = rec.init(jax.random.PRNGKey(0), x128)
        fr = jax.jit(lambda vv, a: rec.apply(vv, a))
        t(f"Reconstruction packed={pk}", fr, vr, x128)

        spy = MESpynet(dtype=bf, packed=pk)
        vs = spy.init(jax.random.PRNGKey(0), x3, x3)
        fs = jax.jit(lambda vv, a, b: spy.apply(vv, a, b))
        t(f"MESpynet packed={pk}", fs, vs, x3, x3)


if __name__ == "__main__":
    main()
