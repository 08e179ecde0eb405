"""Image padding / cropping / metrics.

TPU-native counterparts of the reference helpers
(/root/reference/utils.py:65-98, /root/reference/modules.py:76-104,
 /root/reference/Learner.py:19-34 "Process").

All tensors are NHWC (TPU-friendly layout) unless stated otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pad_amounts(size: int, multiple: int) -> tuple[int, int]:
    target = (size + multiple - 1) // multiple * multiple
    lo = (target - size) // 2
    hi = target - size - lo
    return lo, hi


def pad_to_multiple(x: jnp.ndarray, multiple: int = 64) -> jnp.ndarray:
    """Zero-pad H and W (centered) up to the next multiple.

    Mirrors the symmetric-split constant padding of the reference
    (utils.py:65-78) so bitstream shapes match its eval protocol.
    """
    h, w = x.shape[-3], x.shape[-2]
    top, bottom = _pad_amounts(h, multiple)
    left, right = _pad_amounts(w, multiple)
    pad_cfg = [(0, 0)] * (x.ndim - 3) + [(top, bottom), (left, right), (0, 0)]
    return jnp.pad(x, pad_cfg, mode="constant", constant_values=0.0)


def crop_to_size(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`pad_to_multiple` — centered crop to (h, w)."""
    H, W = x.shape[-3], x.shape[-2]
    h, w = size
    top = (H - h) // 2
    left = (W - w) // 2
    return x[..., top : top + h, left : left + w, :]


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR in dB over the full tensors (reference: utils.py:96-98)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * (2 * jnp.log10(max_val) - jnp.log10(jnp.maximum(mse, 1e-12)))


def rgb_to_255(x: jnp.ndarray) -> jnp.ndarray:
    return x * 255.0


class Normalizer:
    """Detection-style image normalization with R<->B channel swap.

    Equivalent behavior to the reference's ``Process`` module
    (Learner.py:19-34): input is RGB in [0, 255]; the channel order is
    reversed (to BGR-trained backbone statistics) and standardized.
    Invertible via :meth:`inverse`.
    """

    def __init__(
        self,
        mean=(103.53, 116.28, 123.675),
        std=(57.375, 57.12, 58.395),
    ):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x[..., ::-1]
        return (x - self.mean) / self.std

    def inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x * self.std + self.mean
        return x[..., ::-1]
