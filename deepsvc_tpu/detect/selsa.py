"""SELSA aggregation + Temporal ROI Align (pure JAX / flax).

Native re-implementation of the pieces the reference borrows from
mmtracking (SURVEY.md §2.3; temporal_roi_align.py pastes its SELSA
detector into mmtracking's selsa.py):

- SelsaAggregator (Wu et al., "Sequence Level Semantics Aggregation for
  Video Object Detection", ICCV 2019): multi-head dot-product attention
  from current-frame RoI embeddings to reference-frame RoI embeddings,
  added residually after each shared FC of the bbox head.
- Temporal ROI Align (Gong et al., AAAI 2021): for each current RoI
  feature cell, gather the top-K most-similar positions from each
  support-frame feature map and fuse them by attention — letting the RoI
  see its object across frames without boxes on those frames.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SelsaAggregator(nn.Module):
    """Cross-frame RoI attention (mmtracking SelsaAggregator parity)."""

    channels: int = 1024
    num_heads: int = 16

    @nn.compact
    def __call__(self, x, ref):
        """x (R, D) current RoI embeddings; ref (R_ref, D) reference RoI
        embeddings; returns (R, D) aggregated residual."""
        D, H = self.channels, self.num_heads
        q = nn.Dense(D, name="fc_embed")(x).reshape(-1, H, D // H)
        k = nn.Dense(D, name="ref_fc_embed")(ref).reshape(-1, H, D // H)
        v = nn.Dense(D, name="ref_fc")(ref).reshape(-1, H, D // H)
        # (H, R, R_ref)
        att = jnp.einsum("rhd,shd->hrs", q, k) / jnp.sqrt(D / H)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hrs,shd->rhd", att, v).reshape(-1, D)
        return nn.Dense(D, name="fc")(out)


class TemporalRoIAlign(nn.Module):
    """Most-Similar RoI Align + temporal attentional feature aggregation.

    Given current RoI features (R, P, P, C) and support feature maps
    (T, Hf, Wf, C): for every RoI cell, take the top-K most similar
    support positions (cosine similarity), average them into a
    "most-similar RoI feature" per support frame, then fuse current +
    per-frame features with embedding-similarity attention.
    """

    top_k: int = 2
    channels: int = 512

    @nn.compact
    def __call__(self, roi_feats, ref_maps):
        R, P, _, C = roi_feats.shape
        T = ref_maps.shape[0]
        flat_ref = ref_maps.reshape(T, -1, C)  # (T, N, C)

        def norm(v):
            return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)

        q = norm(roi_feats.reshape(R, P * P, C))
        kf = norm(flat_ref)
        # similarity (T, R, P*P, N)
        sim = jnp.einsum("rpc,tnc->trpn", q, kf)
        top_sim, top_idx = jax.lax.top_k(sim, self.top_k)  # (T, R, P*P, K)
        w = jax.nn.softmax(top_sim, axis=-1)

        # gather most-similar features: (T, R, P*P, K, C)
        def gather_t(refs_t, idx_t):
            return refs_t[idx_t]  # (R, P*P, K, C)

        ms = jax.vmap(gather_t)(flat_ref, top_idx)
        ms_roi = (ms * w[..., None]).sum(axis=3)  # (T, R, P*P, C)
        ms_roi = ms_roi.reshape(T, R, P, P, C)

        # temporal attentional aggregation over {current} + T supports
        all_feats = jnp.concatenate([roi_feats[None], ms_roi], axis=0)  # (T+1, ...)
        embed = nn.Conv(C, (1, 1), name="embed_conv")
        e = embed(all_feats.reshape((T + 1) * R, P, P, C)).reshape(T + 1, R, P, P, C)
        e = norm(e)
        att = (e * e[0:1]).sum(-1, keepdims=True)  # (T+1, R, P, P, 1)
        att = jax.nn.softmax(att, axis=0)
        return (all_feats * att).sum(axis=0)  # (R, P, P, C)


class SelsaBBoxHead(nn.Module):
    """2-shared-FC bbox head with a SELSA aggregator after each FC
    (mmtracking SelsaBBoxHead parity): class-agnostic=False, softmax over
    num_classes+1, per-class box deltas."""

    num_classes: int = 30
    fc_channels: int = 1024
    roi_size: int = 7
    in_channels: int = 512

    @nn.compact
    def __call__(self, roi_feats, ref_roi_feats):
        """roi_feats (R, P, P, C), ref_roi_feats (R_ref, P, P, C) ->
        (cls_logits (R, num_classes+1), deltas (R, (num_classes+1)*4))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        ref = ref_roi_feats.reshape(ref_roi_feats.shape[0], -1)
        for i in range(2):
            fc = nn.Dense(self.fc_channels, name=f"shared_fc{i}")
            x = fc(x)
            ref = fc(ref)
            agg = SelsaAggregator(self.fc_channels, name=f"aggregator{i}")
            x = x + agg(x, ref)
            ref = ref + agg(ref, ref)
            x = nn.relu(x)
            ref = nn.relu(ref)
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg = nn.Dense((self.num_classes + 1) * 4, name="fc_reg")(x)
        return cls, reg
