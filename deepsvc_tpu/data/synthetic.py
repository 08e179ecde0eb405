"""Synthetic video clips: deterministic moving-texture sequences.

Used by unit tests and benchmarks where no real dataset is mounted; the
shapes/dtypes match the Vimeo-90k pipeline output (f, B, H, W, 3 in
[0, 1] plus per-frame semantic features).
"""

from __future__ import annotations

import numpy as np


def make_clip_batch(
    rng: np.random.Generator,
    frames: int = 7,
    batch: int = 2,
    height: int = 64,
    width: int = 64,
    max_shift: int = 2,
) -> np.ndarray:
    """(f, B, H, W, 3) float32 clip with rigid translation + noise."""
    pad = max_shift * frames
    base = rng.random((batch, height + 2 * pad, width + 2 * pad, 3), dtype=np.float32)
    # smooth the base so motion is learnable (vectorized box filter —
    # apply_along_axis was ~seconds per batch on 1-core hosts)
    k = 5
    for axis in (1, 2):
        pad_spec = [(0, 0)] * base.ndim
        pad_spec[axis] = (k // 2 + 1, k // 2)
        padded = np.pad(base, pad_spec, mode="edge")
        csum = np.cumsum(padded, axis=axis, dtype=np.float32)
        hi = np.take(csum, range(k, csum.shape[axis]), axis=axis)
        lo = np.take(csum, range(0, csum.shape[axis] - k), axis=axis)
        base = (hi - lo) / k
    out = np.empty((frames, batch, height, width, 3), np.float32)
    for t in range(frames):
        for b in range(batch):
            dy = pad + int(rng.integers(-max_shift, max_shift + 1)) * t
            dx = pad + int(rng.integers(-max_shift, max_shift + 1)) * t
            crop = base[b, dy : dy + height, dx : dx + width]
            noise = rng.standard_normal(crop.shape).astype(np.float32) * 0.01
            out[t, b] = np.clip(crop + noise, 0.0, 1.0)
    return out


def make_semantic_features(
    rng: np.random.Generator, frames: int, batch: int, height: int, width: int,
    channels: int = 256, zeros: bool = True,
) -> np.ndarray:
    """(f, B, H/4, W/4, C) semantic features (zeros = no-semantic-layer
    configuration, the reference's HZHTrainer_1 mode)."""
    shape = (frames, batch, height // 4, width // 4, channels)
    if zeros:
        return np.zeros(shape, np.float32)
    return rng.standard_normal(shape).astype(np.float32)
