"""Micro-benchmarks of the suspected hot ops at 1080p."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920


def bench(name, fn, *args, n=5):
    fn(*args)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)


def main():
    from deepsvc_tpu.ops import warp, avg_pool_2x2, bilinear_up2

    rng = np.random.default_rng(0)
    img3 = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    img64 = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32))
    flow = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4)

    bench("warp 3ch 1080p", jax.jit(warp), img3, flow)
    bench("warp 64ch 1080p", jax.jit(warp), img64, flow)
    bench("avg_pool_2x2 3ch", jax.jit(avg_pool_2x2), img3)
    bench("bilinear_up2 2ch", jax.jit(bilinear_up2), flow)

    # conv stacks
    import flax.linen as nn

    class Conv7Stack(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            for f in (32, 64, 32, 16):
                x = nn.relu(nn.Conv(f, (7, 7), padding="SAME", dtype=self.dtype)(x))
            return nn.Conv(2, (7, 7), padding="SAME", dtype=self.dtype)(x)

    x8 = jnp.asarray(rng.random((1, H, W, 8), dtype=np.float32))
    m = Conv7Stack()
    v = m.init(jax.random.PRNGKey(0), x8)
    bench("MEBasic conv7 stack bf16 1080p", jax.jit(lambda v, x: m.apply(v, x)), v, x8)

    m32 = Conv7Stack(dtype=jnp.float32)
    v32 = m32.init(jax.random.PRNGKey(0), x8)
    bench("MEBasic conv7 stack f32 1080p", jax.jit(lambda v, x: m32.apply(v, x)), v32, x8)

    class Conv5s2(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(64, (5, 5), strides=(2, 2),
                           padding=[(2, 2), (2, 2)], dtype=jnp.bfloat16)(x)

    m5 = Conv5s2()
    v5 = m5.init(jax.random.PRNGKey(0), x8)
    bench("conv5 s2 8->64 1080p bf16", jax.jit(lambda v, x: m5.apply(v, x)), v5, x8)

    # dispatch overhead: trivial jitted op round trip
    tiny = jnp.zeros((8, 128))
    f = jax.jit(lambda x: x + 1)
    bench("tiny jit dispatch", f, tiny, n=20)

    # D2H transfer cost
    big = jnp.zeros((1, 68, 120, 96), jnp.float32)
    jax.block_until_ready(big)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(big)
    print(f"{'D2H 3.1MB f32':42s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms", flush=True)

    big2 = jnp.zeros((1, 544, 960, 64), jnp.bfloat16)
    jax.block_until_ready(big2)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(big2)
    print(f"{'D2H 66MB bf16':42s} {(time.perf_counter()-t0)/3*1e3:8.1f} ms", flush=True)

    # H2D
    host = np.zeros((1, 68, 120, 12), np.int32)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jnp.asarray(host))
    print(f"{'H2D 390KB int32':42s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
