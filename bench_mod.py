"""Module-context pallas A/B: why is the kernel fast alone, slow in-graph?

Times FeatureExtraction (3 ResBlocks + conv, the mc_stage tail) with the
pallas routing on vs off, then counts copy/transpose/pad ops in the
optimized HLO of the pallas version.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from deepsvc_tpu.models.layers import FeatureExtraction  # noqa: E402
from deepsvc_tpu.ops import pallas_conv  # noqa: E402

H, W = 1088, 1920
SYNC = 0.0


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def t(name, fn, x0, n=6, reps=3):
    y = fn(x0)
    sync(y)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(x0)
        sync(y)
        best.append((time.perf_counter() - t0 - SYNC / 1e3) / n)
    dt = float(np.median(best))
    print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    global SYNC
    rng = np.random.default_rng(0)
    f_id = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128))
    sync(f_id(z))
    t0 = time.perf_counter()
    for _ in range(20):
        sync(f_id(z))
    SYNC = (time.perf_counter() - t0) / 20 * 1e3
    print(f"sync {SYNC:.1f} ms")

    mod = FeatureExtraction(64, dtype=jnp.bfloat16, packed=True)
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32)).astype(
        jnp.bfloat16
    )
    v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)

    pallas_conv.enable(False)
    f_off = jax.jit(lambda a: mod.apply(v, a))
    t("FeatureExtraction XLA", f_off, x)

    pallas_conv.enable(True)
    f_on = jax.jit(lambda a: mod.apply(v, a))
    t("FeatureExtraction PALLAS", f_on, x)

    comp = f_on.lower(x).compile()
    txt = comp.as_text()
    for op in ("copy", "transpose", "pad", "custom-call", "fusion",
               "convolution"):
        print(f"hlo {op:12s}: {txt.count(f' {op}(')+txt.count(f' {op}.')}",
              flush=True)
    # dump the pallas-version HLO for eyeballing
    with open("results/hlo_fe_pallas.txt", "w") as f:
        f.write(txt)
    comp_off = f_off.lower(x).compile()
    with open("results/hlo_fe_xla.txt", "w") as f:
        f.write(comp_off.as_text())


if __name__ == "__main__":
    main()
