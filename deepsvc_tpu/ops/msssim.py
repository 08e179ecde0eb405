"""SSIM / MS-SSIM in pure JAX (NHWC).

Replaces the reference's ``pytorch_msssim`` dependency
(/root/reference/video_model.py:10, test_video.py:7) with the same
algorithm: 11-tap Gaussian window (sigma 1.5), valid convolution,
K=(0.01, 0.03), per-scale contrast terms relu-clamped, scale weights
(0.0448, 0.2856, 0.3001, 0.2363, 0.1333), 2x2 average-pool downsampling
with right/bottom padding for odd sizes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=None)
def _gaussian_window(win_size: int, sigma: float):
    import numpy as np

    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return tuple(g.astype(np.float32).tolist())


def _blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur, VALID padding."""
    C = x.shape[-1]
    k = window.shape[0]
    wh = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, C))
    ww = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, C))
    dn = lax.conv_dimension_numbers(x.shape, (k, 1, 1, C), ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, wh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C)
    dn = lax.conv_dimension_numbers(x.shape, (1, k, 1, C), ("NHWC", "HWIO", "NHWC"))
    x = lax.conv_general_dilated(x, ww, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=C)
    return x


def _ssim_components(x, y, data_range, win_size, sigma, k1, k2):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = jnp.asarray(_gaussian_window(win_size, sigma), dtype=jnp.float32)

    mu1 = _blur(x, win)
    mu2 = _blur(y, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = _blur(x * x, win) - mu1_sq
    sigma2_sq = _blur(y * y, win) - mu2_sq
    sigma12 = _blur(x * y, win) - mu12

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # mean over spatial dims -> (B, C)
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def ssim(x, y, data_range: float = 1.0, win_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM over batch and channels. Inputs NHWC float."""
    s, _ = _ssim_components(
        x.astype(jnp.float32), y.astype(jnp.float32), data_range, win_size, sigma, k1, k2
    )
    return s.mean()


def _downsample_pad(x):
    """2x2 avg pool with replication-free zero padding on odd right/bottom.

    pytorch_msssim pads with F.avg_pool2d(kernel_size=2, padding=H%2) which
    zero-pads both sides; it passes padding=1 only when the size is odd and
    counts padded zeros in the average.  We reproduce that exactly.
    """
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    s = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return s / 4.0


def ms_ssim(x, y, data_range: float = 1.0, win_size: int = 11, sigma: float = 1.5,
            k1: float = 0.01, k2: float = 0.03,
            weights=MS_SSIM_WEIGHTS) -> jnp.ndarray:
    """Multi-scale SSIM, mean over batch/channels. Inputs NHWC float."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # drop scales the image is too small for (the torch reference impl
    # requires size > (win-1)*2^4 and errors otherwise); renormalize the
    # remaining exponent weights so they still sum to 1
    min_side = min(x.shape[1], x.shape[2])
    feasible = 1
    while feasible < len(weights) and (min_side >> feasible) >= win_size:
        feasible += 1
    w = np.asarray(weights[:feasible], dtype=np.float32)
    weights = jnp.asarray(w / w.sum())
    levels = weights.shape[0]

    mcs = []
    s = None
    for i in range(levels):
        s, cs = _ssim_components(x, y, data_range, win_size, sigma, k1, k2)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            x = _downsample_pad(x)
            y = _downsample_pad(y)

    s = jnp.maximum(s, 0.0)  # (B, C)
    stack = jnp.stack(mcs + [s], axis=0)  # (levels, B, C)
    out = jnp.prod(stack ** weights[:, None, None], axis=0)
    return out.mean()
