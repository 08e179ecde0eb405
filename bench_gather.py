"""Gather-variant probes for the warp hot path (bf16, 1080p, 64ch)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920
C = 64


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def t(name, fn, *args, n=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        sync(out)
    print(f"{name:44s} {((time.perf_counter()-t0)/n - 0.037)*1e3:8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32)).astype(jnp.bfloat16)
    flow = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4)

    from deepsvc_tpu.ops import warp

    t("warp current bf16", jax.jit(warp), img, flow)

    def coords(flo):
        gx = jnp.clip(
            jnp.arange(W, dtype=jnp.float32)[None, :] + flo[0, ..., 0], 0, W - 1
        )
        gy = jnp.clip(
            jnp.arange(H, dtype=jnp.float32)[:, None] + flo[0, ..., 1], 0, H - 1
        )
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        wx = gx - x0
        wy = gy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        return x0i, y0i, jnp.minimum(x0i + 1, W - 1), jnp.minimum(y0i + 1, H - 1), wx, wy

    def warp_take(img, flo):
        x0i, y0i, x1i, y1i, wx, wy = coords(flo)
        flat = img[0].reshape(H * W, C)

        def g(yi, xi):
            return jnp.take(flat, (yi * W + xi).reshape(-1), axis=0).reshape(H, W, C)

        wxl = wx[..., None].astype(img.dtype)
        wyl = wy[..., None].astype(img.dtype)
        top = g(y0i, x0i) * (1 - wxl) + g(y0i, x1i) * wxl
        bot = g(y1i, x0i) * (1 - wxl) + g(y1i, x1i) * wxl
        return (top * (1 - wyl) + bot * wyl)[None]

    t("warp jnp.take axis0", jax.jit(warp_take), img, flow)

    def warp_onegather(img, flo):
        """4 neighbors via one gather of stacked indices."""
        x0i, y0i, x1i, y1i, wx, wy = coords(flo)
        flat = img[0].reshape(H * W, C)
        idx = jnp.stack(
            [y0i * W + x0i, y0i * W + x1i, y1i * W + x0i, y1i * W + x1i]
        ).reshape(-1)
        v = jnp.take(flat, idx, axis=0).reshape(4, H, W, C)
        wxl = wx[..., None].astype(img.dtype)
        wyl = wy[..., None].astype(img.dtype)
        top = v[0] * (1 - wxl) + v[1] * wxl
        bot = v[2] * (1 - wxl) + v[3] * wxl
        return (top * (1 - wyl) + bot * wyl)[None]

    t("warp one fused gather", jax.jit(warp_onegather), img, flow)

    def warp_mapcoords(img, flo):
        from jax.scipy.ndimage import map_coordinates

        gx = jnp.arange(W, dtype=jnp.float32)[None, :] + flo[0, ..., 0]
        gy = jnp.arange(H, dtype=jnp.float32)[:, None] + flo[0, ..., 1]
        gx = jnp.clip(gx, 0, W - 1)
        gy = jnp.clip(gy, 0, H - 1)

        def per_ch(ch):
            return map_coordinates(ch, [gy, gx], order=1, mode="nearest")

        return jax.vmap(per_ch, in_axes=2, out_axes=2)(img[0])[None]

    t("warp map_coordinates vmap-ch", jax.jit(warp_mapcoords), img, flow)

    # row-band hypothesis: nearest-only single gather cost
    def warp_nearest(img, flo):
        x0i, y0i, x1i, y1i, wx, wy = coords(flo)
        flat = img[0].reshape(H * W, C)
        xi = jnp.where(wx > 0.5, x1i, x0i)
        yi = jnp.where(wy > 0.5, y1i, y0i)
        return jnp.take(flat, (yi * W + xi).reshape(-1), axis=0).reshape(1, H, W, C)

    t("warp nearest 1 gather", jax.jit(warp_nearest), img, flow)

    # dynamic_slice row-loop alternative is O(H) control — skip.

    # 128-channel gather: does row width amortize?
    img128 = jnp.concatenate([img, img], axis=-1)

    def g128(img, flo):
        x0i, y0i, *_ = coords(flo)
        flat = img[0].reshape(H * W, 128)
        return jnp.take(flat, (y0i * W + x0i).reshape(-1), axis=0)

    t("single gather 128ch", jax.jit(g128), img128, flow)

    def g64(img, flo):
        x0i, y0i, *_ = coords(flo)
        flat = img[0].reshape(H * W, C)
        return jnp.take(flat, (y0i * W + x0i).reshape(-1), axis=0)

    t("single gather 64ch", jax.jit(g64), img, flow)

    img8 = img[..., :8]

    def g8(img, flo):
        x0i, y0i, *_ = coords(flo)
        flat = img[0].reshape(H * W, 8)
        return jnp.take(flat, (y0i * W + x0i).reshape(-1), axis=0)

    t("single gather 8ch", jax.jit(g8), img8, flow)


if __name__ == "__main__":
    main()
