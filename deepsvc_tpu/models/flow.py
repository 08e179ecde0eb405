"""SPyNet-style pyramid optical flow (NHWC, flax).

Re-design of the reference's ME_Spynet (/root/reference/modules.py:123-170):
4-level coarse-to-fine estimation; per level the flow is 2x the upsampled
coarser flow plus a 5-conv refinement over [im1, warp(im2, flow_up),
flow_up].  The pyramid is built with 2x2 average pooling.

SPyNet: Ranjan & Black, "Optical Flow Estimation using a Spatial Pyramid
Network" (arXiv:1611.00850).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import avg_pool_2x2, bilinear_up2, warp
from .layers import Conv

Dtype = Any


class MEBasic(nn.Module):
    """One pyramid level: 5x conv7 (8->32->64->32->16->2), ReLU between
    (modules.py:123-139).

    packed: 7x7 convs via the exact h2 lowering (layers.Conv)."""

    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        pk = self.packed and x.shape[2] % 2 == 0
        if pk:
            # whole level in the (W/2, 2C) packed view: one reshape pair
            B, H, W, C = x.shape
            x = x.reshape(B, H, W // 2, 2 * C)
            for feat in (32, 64, 32, 16):
                x = nn.relu(Conv(feat, 7, 1, dtype=self.dtype, packed_io=True)(x))
            x = Conv(2, 7, 1, dtype=self.dtype, packed_io=True)(x)
            return x.reshape(B, H, W, 2)
        for feat in (32, 64, 32, 16):
            x = nn.relu(Conv(feat, 7, 1, dtype=self.dtype, packed=self.packed)(x))
        return Conv(2, 7, 1, dtype=self.dtype, packed=self.packed)(x)


class MESpynet(nn.Module):
    """4-level coarse-to-fine flow: flow(im2 -> im1) in pixels
    (modules.py:142-170).

    ``base_scale=2`` runs the whole pyramid on 2x-downsampled frames and
    upsamples the flow at the end (values doubled back to full-res
    pixels).  The finest level's 5x conv7 chain at 1080p is ~2/3 of the
    flow cost; the MV codec's RefineNet sees the full-res frames either
    way, so the precision loss is partially recovered downstream (the
    fast serving profile, r4 perf redesign — reference always runs full
    res)."""

    levels: int = 4
    base_scale: int = 1
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, im1, im2):
        if self.base_scale == 2:
            flow = self._pyramid(avg_pool_2x2(im1), avg_pool_2x2(im2))
            return bilinear_up2(flow) * 2.0
        return self._pyramid(im1, im2)

    def _pyramid(self, im1, im2):
        pyr1 = [im1]
        pyr2 = [im2]
        for _ in range(self.levels - 1):
            pyr1.append(avg_pool_2x2(pyr1[-1]))
            pyr2.append(avg_pool_2x2(pyr2[-1]))

        B, Hc, Wc, _ = pyr1[-1].shape
        flow = jnp.zeros((B, Hc // 2, Wc // 2, 2), im1.dtype)
        for level in range(self.levels):
            flow_up = bilinear_up2(flow) * 2.0
            i = self.levels - 1 - level
            inp = jnp.concatenate([pyr1[i], warp(pyr2[i], flow_up), flow_up], axis=-1)
            flow = flow_up + MEBasic(dtype=self.dtype, packed=self.packed)(inp)
        return flow
