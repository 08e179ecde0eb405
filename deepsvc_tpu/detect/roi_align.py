"""RoIAlign in pure JAX (mmcv `aligned=True` semantics).

Native replacement for mmcv's CUDA RoIAlign: each output cell averages
``sampling_ratio x sampling_ratio`` bilinear samples; with aligned=True
the half-pixel offset is subtracted (the mmdet default the reference's
detection stack uses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(fmap, ys, xs):
    """fmap (H, W, C); ys/xs (...,) -> (..., C), zero outside."""
    H, W, C = fmap.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = fmap[yc, xc]
        return v * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def roi_align(
    fmap: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """fmap (H, W, C); boxes (R, 4) in image pixels -> (R, out, out, C)."""
    offset = 0.5 if aligned else 0.0
    b = boxes * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    rw = jnp.maximum(x2 - x1, 1e-4)
    rh = jnp.maximum(y2 - y1, 1e-4)
    bin_w = rw / out_size
    bin_h = rh / out_size

    s = sampling_ratio
    # sample offsets within a bin: (i + 0.5)/s for i in [0, s)
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s

    # grid of sample coords: (R, out, s)
    gy = (
        y1[:, None, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, :, None] + frac[None, None, :])
        * bin_h[:, None, None]
    )
    gx = (
        x1[:, None, None]
        + (jnp.arange(out_size, dtype=jnp.float32)[None, :, None] + frac[None, None, :])
        * bin_w[:, None, None]
    )
    # full sampling grid (R, oy, ox, iy, ix)
    R = boxes.shape[0]
    ys = jnp.broadcast_to(gy[:, :, None, :, None], (R, out_size, out_size, s, s))
    xs = jnp.broadcast_to(gx[:, None, :, None, :], (R, out_size, out_size, s, s))

    samples = _bilinear_sample(fmap, ys, xs)  # (R, out, out, s, s, C)
    return samples.mean(axis=(3, 4))
