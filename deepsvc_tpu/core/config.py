"""Declarative config system.

The reference scatters its configuration across argparse (utils.py:14-56),
hard-coded lambda tables (Learner.py:584-597, test_video.py:164-174) and
instance constants. Here everything is a typed, nestable, serializable
dataclass tree with dotted-path overrides.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_dict(v) for v in obj]
    return obj


@dataclass
class Config:
    """Base class: serialization + dotted overrides for all config trees."""

    def to_dict(self) -> dict:
        return _to_dict(self)

    def to_json(self, **kw) -> str:
        return json.dumps(self.to_dict(), indent=2, **kw)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def override(self, overrides: dict[str, Any]) -> "Config":
        """Apply {"a.b.c": value} style overrides, returning a new config."""
        out = self
        for key, value in overrides.items():
            parts = key.split(".")
            out = _set_path(out, parts, value)
        return out


def _set_path(cfg: Any, parts: list[str], value: Any) -> Any:
    if len(parts) == 1:
        if not any(f.name == parts[0] for f in dataclasses.fields(cfg)):
            raise KeyError(f"unknown config field: {parts[0]} on {type(cfg).__name__}")
        return dataclasses.replace(cfg, **{parts[0]: value})
    child = getattr(cfg, parts[0])
    return dataclasses.replace(cfg, **{parts[0]: _set_path(child, parts[1:], value)})


# ---------------------------------------------------------------------------
# Rate-point tables (reference: test_video.py:164-174, Learner.py:584-597)
# ---------------------------------------------------------------------------

# P-codec lambda -> (I-codec lambda MSE, I-codec lambda MS-SSIM,
#                    feature-distillation weight, detection beta)
RATE_POINTS = {
    80: dict(i_lambda_mse=0.0067, i_lambda_msssim=8.73, fea_mse=4, beta=3),
    160: dict(i_lambda_mse=0.013, i_lambda_msssim=16.64, fea_mse=8, beta=6),
    320: dict(i_lambda_mse=0.025, i_lambda_msssim=31.73, fea_mse=16, beta=12),
    640: dict(i_lambda_mse=0.0483, i_lambda_msssim=60.5, fea_mse=20, beta=16),
    1280: dict(i_lambda_mse=0.0932, i_lambda_msssim=115.37, fea_mse=24, beta=20),
}

P_LAMBDAS_PSNR = (80, 160, 320, 640, 1280)
P_LAMBDAS_MSSSIM = (8, 16, 32, 64)  # l_MSSSIM = l_PSNR / 50 semantics


@dataclass
class ModelConfig(Config):
    """Structure/texture P-frame codec hyper-parameters (video_model.py:13-25)."""

    mv_latent: int = 64        # MV codec latent channels N
    res_latent: int = 96       # residual codec latent channels N
    feature_channels: int = 64  # feature-space residual width
    context_channels: int = 32  # InterLayerPrediction `up_out`
    semantic_channels: int = 256  # stage-1 semantic feature width
    # fast serving profile (1 = reference-shaped, 2 = half-res flow base
    # / MC-fusion branch; models/flow.py + models/pframe.py)
    me_base_scale: int = 1
    fuse_scale: int = 1


@dataclass
class ImageCodecConfig(Config):
    """I-frame codec (image_model.py:331-438)."""

    N: int = 192
    M: int = 320
    num_slices: int = 10
    # Reference shape (image_model.py:437-438).  The r4 perf cut to 2
    # support slices measured +24.6% bpp for +0.14 dB at equal steps
    # (results/slice_ab.json), and the I-codec only decodes once per
    # GOP, so the latency saving does not pay — reverted in r6.
    max_support_slices: int = 5


@dataclass
class SemanticConfig(Config):
    """Semantic feature codec (semantic_layer.py:1188-1321)."""

    N: int = 72
    cond_entropy: bool = True
    # Reference's `SELSA.multi_supp` is read but never assigned
    # (temporal_roi_align.py:294-303); here it is an explicit flag.
    multi_supp: bool = False


@dataclass
class TrainConfig(Config):
    """Staged trainer schedule (Learner.py:44-48, 496-505; utils.py:14-56)."""

    seed: int = 16
    batch_size: int = 2
    lr: float = 1e-4
    aux_lr: float = 1e-3
    clip_grad: float = 1.0          # per-element clamp (Learner.py:560-564)
    lambda_rd: int = 640            # l_PSNR
    metric: str = "mse"             # "mse" | "msssim"
    crop: int = 256
    # stage boundaries in global steps
    stage_steps: tuple = (300_000, 400_000, 500_000, 600_000, 700_000)
    # unrolled frames per stage band (get_f, Learner.py:496-505)
    frames_per_stage: tuple = (2, 4, 7, 5)
    warp_weight: float = 0.1
    mc_weight: float = 0.15
    mc_weight_final: float = 0.01   # v2 trainer (Learner.py:1123)


@dataclass
class EvalConfig(Config):
    """RD evaluation protocol (test_video.py:18-161)."""

    frames: int = 96
    gop: int = 12
    pad_multiple: int = 64


@dataclass
class DeepSVCConfig(Config):
    model: ModelConfig = field(default_factory=ModelConfig)
    image_codec: ImageCodecConfig = field(default_factory=ImageCodecConfig)
    semantic: SemanticConfig = field(default_factory=SemanticConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
