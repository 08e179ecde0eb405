"""A/B microbench: bilinear-warp tap-unpack formulations at 1080p.

The r6 trace attributed ~116 ms/call to the (..., 4, C) reshape after
the packed gather (a minor-axis split = relayout).  This times the old
reshape-unpack against the channel-slice unpack now in ops/warp.py,
plus the dtype effect (f32 vs bf16 gather rows).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W, C = 1088, 1920, 67


def warp_reshape(image, flow):  # the pre-r6 formulation
    from deepsvc_tpu.ops.warp import _shift_left, _shift_up

    B, H, W, C = image.shape
    orig_dtype = image.dtype
    flo = jnp.nan_to_num(flow.astype(jnp.float32))
    gx = jnp.clip(jnp.arange(W, dtype=jnp.float32)[None, None, :] + flo[..., 0], 0.0, W - 1.0)
    gy = jnp.clip(jnp.arange(H, dtype=jnp.float32)[None, :, None] + flo[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    wx = gx - x0; wy = gy - y0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    sx = _shift_left(image)
    quad = jnp.concatenate([image, sx, _shift_up(image), _shift_up(sx)], axis=-1)
    flat = quad.reshape(B, H * W, 4 * C)
    idx = (y0i * W + x0i).reshape(B, H * W)
    v = jax.vmap(lambda f, i: f.at[i].get(mode="promise_in_bounds"))(flat, idx).reshape(B, H, W, 4, C)
    wdt = orig_dtype
    wx = wx[..., None].astype(wdt); wy = wy[..., None].astype(wdt)
    top = v[..., 0, :] * (1.0 - wx) + v[..., 1, :] * wx
    bot = v[..., 2, :] * (1.0 - wx) + v[..., 3, :] * wx
    return (top * (1.0 - wy) + bot * wy).astype(orig_dtype)


def bench(fn, img, flo, n=6):
    f = jax.jit(fn)
    sync = lambda o: np.asarray(o.ravel()[0:1])  # axon: block_until_ready no-ops
    out = f(img, flo); sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(img, flo)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from deepsvc_tpu.ops.warp import warp

    rng = np.random.default_rng(0)
    img32 = jnp.asarray(rng.random((1, H, W, C), dtype=np.float32))
    flo = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4)
    img16 = img32.astype(jnp.bfloat16)

    for name, img in (("f32", img32), ("bf16", img16)):
        told = bench(warp_reshape, img, flo)
        tnew = bench(warp, img, flo)
        print(f"{name}: reshape-unpack {told:7.1f} ms   slice-unpack {tnew:7.1f} ms   "
              f"speedup {told / tnew:4.2f}x")
    # equality check (f32 exact)
    a = jax.jit(warp_reshape)(img32, flo)
    b = jax.jit(lambda i, f: warp(i, f))(img32, flo)
    print("max|diff| f32:", float(jnp.abs(a - b).max()))


if __name__ == "__main__":
    main()
