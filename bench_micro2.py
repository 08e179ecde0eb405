"""Bisect the 1080p hot path: single convs, blocks, warp variants."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 1088, 1920
SYNC_MS = 0.0  # measured below


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def t(name, fn, *args, n=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3 - SYNC_MS
    print(f"{name:46s} {dt:8.1f} ms", flush=True)
    return out


def main():
    global SYNC_MS
    import flax.linen as nn

    from deepsvc_tpu.models.layers import Conv, Reconstruction, ResBlock, SELayer, UNet

    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.random((1, H, W, 64), dtype=np.float32)).astype(jnp.bfloat16)
    x128 = jnp.concatenate([x64, x64], axis=-1)
    x3 = x64[..., :3]
    flow = jnp.asarray(rng.standard_normal((1, H, W, 2)).astype(np.float32) * 4)

    f_id = jax.jit(lambda x: x + 1)
    out = f_id(jnp.zeros((8, 128)))
    sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        sync(f_id(jnp.zeros((8, 128))))
    SYNC_MS = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{'sync overhead':46s} {SYNC_MS:8.1f} ms (subtracted below)")

    # ---- single convs, bf16 ----
    def mk(mod, *args):
        v = mod.init(jax.random.PRNGKey(0), *args)
        return jax.jit(lambda *a: mod.apply(v, *a))

    conv64 = mk(Conv(64, 3, 1, dtype=jnp.bfloat16), x64)
    t("conv3x3 64->64 bf16", conv64, x64)
    conv64s = mk(Conv(64, 5, 2, dtype=jnp.bfloat16), x64)
    t("conv5x5 s2 64->64 bf16", conv64s, x64)
    conv128 = mk(Conv(64, 3, 1, dtype=jnp.bfloat16), x128)
    t("conv3x3 128->64 bf16", conv128, x128)
    rb = mk(ResBlock(64, dtype=jnp.bfloat16), x64)
    t("ResBlock 64 bf16", rb, x64)
    se = mk(SELayer(64, dtype=jnp.bfloat16), x64)
    t("SELayer 64 bf16", se, x64)
    un = mk(UNet(32, dtype=jnp.bfloat16), x64)
    t("UNet(32) on 64ch bf16", un, x64)
    rec = mk(Reconstruction(channels=64, out_ch=3, dtype=jnp.bfloat16), x128)
    t("Reconstruction bf16", rec, x128)

    # f32 comparison for one conv
    x64f = x64.astype(jnp.float32)
    conv64f = mk(Conv(64, 3, 1), x64f)
    t("conv3x3 64->64 f32", conv64f, x64f)

    # ---- warp variants ----
    from deepsvc_tpu.ops import warp

    t("warp current 3ch bf16", jax.jit(warp), x3, flow)
    t("warp current 64ch bf16", jax.jit(warp), x64, flow)

    def coords(flo):
        gx = jnp.clip(jnp.arange(W, dtype=jnp.float32)[None, :] + flo[0, ..., 0], 0, W - 1)
        gy = jnp.clip(jnp.arange(H, dtype=jnp.float32)[:, None] + flo[0, ..., 1], 0, H - 1)
        x0 = jnp.floor(gx); y0 = jnp.floor(gy)
        return (x0.astype(jnp.int32), y0.astype(jnp.int32), gx - x0, gy - y0)

    def warp_take(img, flo, C):
        """flat jnp.take, promise_in_bounds, quad-pack."""
        x0i, y0i, wx, wy = coords(flo)
        sx = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        quad = jnp.concatenate(
            [img, sx,
             jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1),
             jnp.concatenate([sx[:, 1:], sx[:, -1:]], axis=1)], axis=-1)
        flat = quad.reshape(H * W, 4 * C)
        v = flat.at[(y0i * W + x0i).reshape(-1)].get(
            mode="promise_in_bounds").reshape(H, W, 4, C)
        wxl = wx[..., None].astype(img.dtype); wyl = wy[..., None].astype(img.dtype)
        top = v[..., 0, :] * (1 - wxl) + v[..., 1, :] * wxl
        bot = v[..., 2, :] * (1 - wxl) + v[..., 3, :] * wxl
        return (top * (1 - wyl) + bot * wyl)[None]

    t("warp take+inbounds 3ch bf16", jax.jit(lambda i, f: warp_take(i, f, 3)), x3, flow)
    t("warp take+inbounds 64ch bf16", jax.jit(lambda i, f: warp_take(i, f, 64)), x64, flow)

    def warp_2g(img, flo):
        """two 128-lane gathers (x-pair pack), 64ch."""
        x0i, y0i, wx, wy = coords(flo)
        sx = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        pair = jnp.concatenate([img, sx], axis=-1).reshape(H * W, 128)
        i0 = (y0i * W + x0i).reshape(-1)
        i1 = (jnp.minimum(y0i + 1, H - 1) * W + x0i).reshape(-1)
        v0 = pair.at[i0].get(mode="promise_in_bounds").reshape(H, W, 2, 64)
        v1 = pair.at[i1].get(mode="promise_in_bounds").reshape(H, W, 2, 64)
        wxl = wx[..., None].astype(img.dtype); wyl = wy[..., None].astype(img.dtype)
        top = v0[..., 0, :] * (1 - wxl) + v0[..., 1, :] * wxl
        bot = v1[..., 0, :] * (1 - wxl) + v1[..., 1, :] * wxl
        return (top * (1 - wyl) + bot * wyl)[None]

    t("warp 2x128-gather 64ch bf16", jax.jit(warp_2g), x64, flow)


if __name__ == "__main__":
    main()
