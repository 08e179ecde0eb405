"""Resampling / pooling ops (NHWC).

Counterparts of the reference's bilinear up/down sampling
(/root/reference/modules.py:107-120, F.interpolate align_corners=False)
and the pooling layers used by SPyNet (avg_pool2d k2s2, modules.py:156)
and UNet / ResNet stems (max pool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pooling (modules.py:156)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.mean(axis=(2, 4))


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pooling with explicit symmetric padding (torch semantics)."""
    # -inf (not finfo.min) so XLA lowers to the differentiable
    # reduce-window-max primitive
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    """x2 bilinear upsample, align_corners=False (modules.py:107-112)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear", antialias=False)


def bilinear_down2(x: jnp.ndarray) -> jnp.ndarray:
    """x0.5 bilinear downsample, align_corners=False (modules.py:115-120).

    For even sizes, half-pixel-center bilinear sampling at stride 2 lands
    exactly midway between 2x2 blocks, i.e. it IS 2x2 average pooling.
    """
    return avg_pool_2x2(x)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear", antialias=False)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space with torch PixelShuffle channel ordering.

    Input (B, H, W, C*r*r) where the channel index decomposes as
    c * r * r + i * r + j (channel-major, matching torch's NCHW
    pixel_shuffle); output (B, H*r, W*r, C).
    """
    B, H, W, CRR = x.shape
    C = CRR // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(B, H * r, W * r, C)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Space-to-depth, inverse of :func:`pixel_shuffle`."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/r, W/r, C, r, r
    return x.reshape(B, H // r, W // r, C * r * r)
