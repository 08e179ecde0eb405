"""Peak-throughput probes: matmul roofline, conv widths, gather variants."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def t(name, fn, *args, n=3, flops=None, bytes_=None):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / n - 0.037  # subtract sync latency
    extra = ""
    if flops:
        extra += f" {flops/max(dt,1e-9)/1e12:7.1f} TF/s"
    if bytes_:
        extra += f" {bytes_/max(dt,1e-9)/1e9:7.1f} GB/s"
    print(f"{name:40s} {dt*1e3:8.1f} ms{extra}", flush=True)


def main():
    k = 8192
    a = jnp.ones((k, k), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    t("matmul 8192^3 bf16", mm, a, flops=2 * k**3)

    a32 = jnp.ones((4096, 4096), jnp.float32)
    mm32 = jax.jit(lambda a: a @ a)
    t("matmul 4096^3 f32", mm32, a32, flops=2 * 4096**3)

    H, W = 1088, 1920
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32)).astype(jnp.bfloat16)

    import flax.linen as nn

    for C, k_ in ((64, 3), (64, 7), (128, 3)):
        m = nn.Conv(C, (k_, k_), padding="SAME", dtype=jnp.bfloat16)
        v = m.init(jax.random.PRNGKey(0), x64)
        f = jax.jit(lambda v, x: m.apply(v, x))
        t(f"conv{k_}x{k_} 64->{C} 1080p bf16", f, v, x64,
          flops=2 * H * W * k_ * k_ * 64 * C)

    # elementwise bandwidth probe
    add = jax.jit(lambda x: x * 1.00001 + 0.5)
    t("elementwise 1080p x64 bf16", add, x64, bytes_=2 * H * W * 64 * 2)

    # gather variants for warp
    flow = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4)

    from deepsvc_tpu.ops import warp

    t("warp64 current (take_along_axis)", jax.jit(warp), x64, flow,
      bytes_=4 * H * W * 64 * 2 * 2)

    def warp_squeeze(img, flo):
        B, Hh, Ww, C = img.shape
        gx = jnp.clip(jnp.arange(Ww, jnp.float32)[None, :] + flo[0, ..., 0], 0, Ww - 1)
        gy = jnp.clip(jnp.arange(Hh, jnp.float32)[:, None] + flo[0, ..., 1], 0, Hh - 1)
        x0 = jnp.floor(gx); y0 = jnp.floor(gy)
        wx = (gx - x0)[..., None]; wy = (gy - y0)[..., None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, Ww - 1); y1i = jnp.minimum(y0i + 1, Hh - 1)
        flat = img[0].reshape(Hh * Ww, C)

        def g(yi, xi):
            return jnp.take(flat, (yi * Ww + xi).reshape(-1), axis=0).reshape(Hh, Ww, C)

        top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
        bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
        return (top * (1 - wy) + bot * wy)[None]

    t("warp64 squeeze-batch jnp.take", jax.jit(warp_squeeze), x64, flow,
      bytes_=4 * H * W * 64 * 2 * 2)

    def warp_rows_then_cols(img, flo):
        """two-stage: gather full rows (y), then columns (x)."""
        B, Hh, Ww, C = img.shape
        gx = jnp.clip(jnp.arange(Ww, jnp.float32)[None, :] + flo[0, ..., 0], 0, Ww - 1)
        gy = jnp.clip(jnp.arange(Hh, jnp.float32)[:, None] + flo[0, ..., 1], 0, Hh - 1)
        x0 = jnp.floor(gx); y0 = jnp.floor(gy)
        wx = (gx - x0)[..., None]; wy = (gy - y0)[..., None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, Ww - 1); y1i = jnp.minimum(y0i + 1, Hh - 1)
        im = img[0]

        def gcols(rows):  # rows: (H, W, C) already y-gathered; gather x within each row
            flat = rows.reshape(Hh * Ww, C)
            base = jnp.arange(Hh, dtype=jnp.int32)[:, None] * Ww
            a = jnp.take(flat, (base + x0i).reshape(-1), axis=0).reshape(Hh, Ww, C)
            b = jnp.take(flat, (base + x1i).reshape(-1), axis=0).reshape(Hh, Ww, C)
            return a * (1 - wx) + b * wx

        # y-gather entire rows per output row? indices vary per pixel, so
        # gather rows per-pixel is the same cost; this variant just reorders
        r0 = jnp.take(im, y0i.reshape(-1) if y0i.ndim == 2 else y0i, axis=0)
        return None  # placeholder — per-pixel y means no row reuse

    # int8 gather probe: does element width change gather speed?
    x64_i8 = (x64 * 64).astype(jnp.int8)

    def warp_nn(img, flo):
        B, Hh, Ww, C = img.shape
        gx = jnp.clip(jnp.arange(Ww, jnp.float32)[None, :] + flo[0, ..., 0], 0, Ww - 1)
        gy = jnp.clip(jnp.arange(Hh, jnp.float32)[:, None] + flo[0, ..., 1], 0, Hh - 1)
        xi = jnp.round(gx).astype(jnp.int32)
        yi = jnp.round(gy).astype(jnp.int32)
        flat = img[0].reshape(Hh * Ww, C)
        return jnp.take(flat, (yi * Ww + xi).reshape(-1), axis=0).reshape(1, Hh, Ww, C)

    t("warp64 nearest (1 gather)", jax.jit(warp_nn), x64, flow,
      bytes_=H * W * 64 * 2 * 2)


if __name__ == "__main__":
    main()
