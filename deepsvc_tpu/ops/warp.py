"""Backward bilinear warping (motion compensation).

TPU-native equivalent of the reference's ``torch_warp``
(/root/reference/modules.py:25-62): grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) over a [-1,1] mesh grid plus a
flow scaled by 2/(size-1).  In pixel space that is exactly: sample the
source image at (x + u, y + v) with coordinates clamped to the image
border.  No normalized grid is ever materialized here — we work in pixel
coordinates directly, which is both simpler and cheaper.

Layout: images are NHWC, flow is NHW2 with flow[..., 0] = horizontal (u)
and flow[..., 1] = vertical (v) displacement in pixels, matching the
reference's channel order (modules.py:35-36).

Two implementations:
- :func:`warp` — pure-XLA gather formulation (differentiable, used in
  training).
- a fused Pallas kernel lives in ``ops/pallas_warp.py`` for the decode
  hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image`` by ``flow`` (border-clamped bilinear).

    Args:
      image: (B, H, W, C) source frame.
      flow:  (B, H, W, 2) displacements in pixels (u = x, v = y).

    Returns:
      (B, H, W, C) warped frame, same dtype as ``image``.
    """
    B, H, W, C = image.shape
    orig_dtype = image.dtype
    # gather in the image's native dtype (bf16 halves the gather traffic —
    # the dominant cost on TPU); only coordinates/weights are f32
    img = image
    flo = flow.astype(jnp.float32)

    # Sample coordinates in pixel space, clamped to the border.  Clamping
    # the coordinate is equivalent to grid_sample's border padding (which
    # clips the gathered indices): bilinear weights always sum to 1.
    gx = jnp.clip(jnp.arange(W, dtype=jnp.float32)[None, None, :] + flo[..., 0], 0.0, W - 1.0)
    gy = jnp.clip(jnp.arange(H, dtype=jnp.float32)[None, :, None] + flo[..., 1], 0.0, H - 1.0)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0  # in [0, 1)
    wy = gy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = img.reshape(B, H * W, C)

    def gather(yi, xi):
        idx = (yi * W + xi).reshape(B, H * W)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wdt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    wx = wx[..., None].astype(wdt)
    wy = wy[..., None].astype(wdt)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.astype(orig_dtype)
