"""Model construction from the declarative config tree.

Every entry point (main.py, test_video_tpu.py, detection eval) builds
models through these factories so the dataclasses in core/config.py are
the single source of truth for hyper-parameters (the reference instead
hard-codes them at each call site, utils.py:14-56, test_video.py:219-265).
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import DeepSVCConfig


def tiny_config(cfg: DeepSVCConfig | None = None) -> DeepSVCConfig:
    """Reduced sizes for smoke/CI runs (full topology, small latents)."""
    cfg = cfg or DeepSVCConfig()
    return cfg.override({
        "model.mv_latent": 16,
        "model.res_latent": 16,
        "image_codec.N": 32,
        "image_codec.M": 40,
        "image_codec.num_slices": 4,
        "image_codec.max_support_slices": 2,
        "semantic.N": 16,
    })


def build_pframe_codec(cfg: DeepSVCConfig, dtype=jnp.float32):
    from ..models import PFrameCodec

    return PFrameCodec(
        mv_latent=cfg.model.mv_latent,
        res_latent=cfg.model.res_latent,
        feature_channels=cfg.model.feature_channels,
        me_base_scale=cfg.model.me_base_scale,
        fuse_scale=cfg.model.fuse_scale,
        dtype=dtype,
    )


def fast_config(cfg: DeepSVCConfig | None = None) -> DeepSVCConfig:
    """The fast serving profile: half-res flow base + half-res MC fusion
    branch (r4 perf redesign; RD cost measured against the
    reference-shaped profile in the r4 campaign)."""
    cfg = cfg or DeepSVCConfig()
    return cfg.override({"model.me_base_scale": 2, "model.fuse_scale": 2})


def build_image_codec(cfg: DeepSVCConfig, dtype=jnp.float32):
    from ..models import ImageCodec

    return ImageCodec(
        N=cfg.image_codec.N,
        M=cfg.image_codec.M,
        num_slices=cfg.image_codec.num_slices,
        max_support_slices=cfg.image_codec.max_support_slices,
        dtype=dtype,
    )


def build_student(cfg: DeepSVCConfig, depth: int = 50, dtype=jnp.float32):
    from ..models import StudentBackbone

    return StudentBackbone(
        N=cfg.semantic.N, depth=depth, out_indices=(0,), dtype=dtype
    )


def build_teacher(cfg: DeepSVCConfig, depth: int = 50, dtype=jnp.float32):
    from ..models import ResNetTeacher

    return ResNetTeacher(depth=depth, out_indices=(0,), dtype=dtype)


def select_support(supp, multi_supp: bool):
    """The reference's `SELSA.multi_supp` ambiguity made explicit
    (temporal_roi_align.py:294-303,513: the flag is read but never
    assigned).  True: the student aggregates over the full support FIFO;
    False: only the most recent support feature is used."""
    return supp if multi_supp else supp[-1:]
