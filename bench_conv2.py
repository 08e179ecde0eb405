"""Conv sweep round 2: map the fast regime boundary (n=5, bf16)."""

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


def t(name, fn, *args, flops=0, n=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / n - SYNC / 1e3
    tf = flops / dt / 1e12 if flops else 0
    print(f"{name:44s} {dt*1e3:8.2f} ms  {tf:6.1f} TF/s", flush=True)


def conv(x, k, cout):
    w = jnp.zeros((k, k, x.shape[-1], cout), x.dtype)
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
    for _ in range(20):
        sync(f_id(z))
    SYNC = (time.perf_counter() - t0) / 20 * 1e3
    print(f"sync {SYNC:.1f} ms")

    cases = [
        (3, 64, 64, H // 2, W // 2),
        (3, 128, 128, H // 2, W // 2),   # re-check the 0.6ms result
        (3, 256, 256, H // 2, W // 2),
        (3, 512, 512, H // 2, W // 2),
        (3, 256, 256, H // 4, W // 4),
        (3, 512, 512, H // 4, W // 4),
        (5, 128, 128, H // 2, W // 2),
        (5, 256, 256, H // 2, W // 2),
        (5, 32, 128, H // 2, W // 2),
        (3, 128, 128, H, W),             # re-check full-res 128
    ]
    for k, cin, cout, hh, ww in cases:
        x = jnp.asarray(rng.random((1, hh, ww, cin), dtype=np.float32)).astype(jnp.bfloat16)
        fl = 2 * hh * ww * k * k * cin * cout
        t(f"conv{k}x{k} {cin}->{cout} @{hh}x{ww}",
          jax.jit(lambda a, k=k, co=cout: conv(a, k, co)), x, flops=fl)


if __name__ == "__main__":
    main()
