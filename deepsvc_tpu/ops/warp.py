"""Backward bilinear warping (motion compensation).

TPU-native equivalent of the reference's ``torch_warp``
(/root/reference/modules.py:25-62): grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) over a [-1,1] mesh grid plus a
flow scaled by 2/(size-1).  In pixel space that is exactly: sample the
source image at (x + u, y + v) with coordinates clamped to the image
border.

Layout: images are NHWC, flow is NHW2 with flow[..., 0] = horizontal (u)
and flow[..., 1] = vertical (v) displacement in pixels, matching the
reference's channel order (modules.py:35-36).

TPU performance note: gather cost on TPU is per-ROW (~fixed per gathered
row, regardless of row width).  A naive bilinear warp needs 4 gathers
(the 2x2 neighborhood).  Instead we pack the four neighbors into the
channel axis with edge-clamped shifts (cheap, HBM-bound elementwise) and
issue ONE gather of 4C-wide rows — measured ~3.5x faster at 1080p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_left(x):  # I(y, x+1), edge-clamped
    return jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)


def _shift_up(x):  # I(y+1, x), edge-clamped
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``image`` by ``flow`` (border-clamped bilinear).

    Args:
      image: (B, H, W, C) source frame (gathered in its native dtype;
        bf16 halves the traffic).
      flow:  (B, H, W, 2) displacements in pixels (u = x, v = y).

    Returns:
      (B, H, W, C) warped frame, same dtype as ``image``.
    """
    B, H, W, C = image.shape
    orig_dtype = image.dtype
    # Sanitize: clip(NaN) = NaN and its int32 cast is implementation-
    # defined, which would turn the promise_in_bounds gather below into
    # an out-of-bounds read under diverging flow (ADVICE r2 #3).
    flo = jnp.nan_to_num(
        flow.astype(jnp.float32), posinf=float(max(H, W)), neginf=-float(max(H, W))
    )

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

    # pack the 2x2 neighborhood into channels: [I00, I01, I10, I11]
    sx = _shift_left(image)
    quad = jnp.concatenate([image, sx, _shift_up(image), _shift_up(sx)], axis=-1)
    flat = quad.reshape(B, H * W, 4 * C)
    idx = (y0i * W + x0i).reshape(B, H * W)
    # indices are clamped to [0, H*W) by construction; promising
    # in-bounds skips XLA's bounds-check+select on every gathered row
    v = jax.vmap(
        lambda f, i: f.at[i].get(mode="promise_in_bounds")
    )(flat, idx).reshape(B, H, W, 4 * C)
    # Unpack the four taps with CHANNEL SLICES, not a (..., 4, C)
    # reshape: splitting the minor (tiled) axis into (4, C) is a real
    # relayout — the r6 1080p trace charged 116 ms/call to that single
    # reshape, ~15% of the whole frame's device time — while slices of
    # the minor axis fuse straight into the lerp fusion below.
    v00, v01 = v[..., 0 * C : 1 * C], v[..., 1 * C : 2 * C]
    v10, v11 = v[..., 2 * C : 3 * C], v[..., 3 * C : 4 * C]

    wdt = orig_dtype if jnp.issubdtype(orig_dtype, jnp.floating) else jnp.float32
    wx = wx[..., None].astype(wdt)
    wy = wy[..., None].astype(wdt)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.astype(orig_dtype)
