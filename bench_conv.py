"""Conv lowering sweep at 1080p: find where XLA:TPU conv is fast."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920
SYNC = 0.0


def sync(x):
    np.asarray(x.ravel()[0])


def t(name, fn, *args, flops=0, n=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / n - SYNC / 1e3
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:44s} {dt*1e3:8.1f} ms  {tf:6.1f} TF/s", flush=True)


def conv(x, k, cin, cout, dtype):
    w = jnp.zeros((k, k, cin, cout), dtype)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def conv_bf16acc(x, k, cin, cout, dtype):
    w = jnp.zeros((k, k, cin, cout), dtype)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    global SYNC
    rng = np.random.default_rng(0)
    f_id = jax.jit(lambda x: x + 1)
    z = jnp.zeros((8, 128))
    sync(f_id(z))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(f_id(z))
    SYNC = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync {SYNC:.1f} ms")

    for cin, cout, k, hh, ww in [
        (64, 64, 3, H, W),
        (128, 128, 3, H, W),
        (128, 128, 3, H // 2, W // 2),
        (256, 256, 3, H // 4, W // 4),
        (512, 512, 3, H // 8, W // 8),
        (32, 32, 3, H, W),
        (8, 32, 7, H, W),
        (32, 64, 7, H, W),
        (64, 64, 7, H, W),
        (64, 64, 5, H, W),
    ]:
        x = jnp.asarray(rng.random((1, hh, ww, cin), dtype=np.float32)).astype(jnp.bfloat16)
        fl = 2 * hh * ww * k * k * cin * cout
        t(f"conv{k}x{k} {cin}->{cout} @{hh}x{ww} f32acc",
          jax.jit(lambda a, k=k, ci=cin, co=cout: conv(a, k, ci, co, jnp.bfloat16)),
          x, flops=fl)
        t(f"conv{k}x{k} {cin}->{cout} @{hh}x{ww} bf16acc",
          jax.jit(lambda a, k=k, ci=cin, co=cout: conv_bf16acc(a, k, ci, co, jnp.bfloat16)),
          x, flops=fl)


if __name__ == "__main__":
    main()
