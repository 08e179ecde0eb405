"""Import torchvision ResNet-50 weights into the JAX teacher/student.

The reference initializes its backbones from ``torchvision://resnet50``
(/root/reference/semantic_layer.py:476).  This converter maps a
torchvision ``resnet50`` state_dict (a local .pth file — no network
access needed) onto deepsvc_tpu.models.resnet.ResNetTeacher's parameter
tree, including the frozen BN running statistics.

Layout conversion: torch conv weights are (out, in, kh, kw); flax wants
HWIO (kh, kw, in, out).
"""

from __future__ import annotations

import numpy as np


def _k(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _bn(prefix: str, sd: dict):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_resnet50(state_dict: dict, stage_blocks=(3, 4, 6, 3)) -> dict:
    """torchvision resnet50 state_dict -> {"params": ..., "batch_stats": ...}
    for ResNetTeacher (fc weights are ignored)."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in state_dict.items()}

    params: dict = {"stem": {"conv1": {"kernel": _k(sd["conv1.weight"])}}}
    stats: dict = {"stem": {}}
    bn_p, bn_s = _bn("bn1", sd)
    params["stem"]["bn1"] = bn_p
    stats["stem"]["bn1"] = bn_s

    for li, nblocks in enumerate(stage_blocks, start=1):
        lp: dict = {}
        ls: dict = {}
        for b in range(nblocks):
            bp: dict = {}
            bs: dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _k(sd[f"layer{li}.{b}.conv{ci}.weight"])}
                p, s = _bn(f"layer{li}.{b}.bn{ci}", sd)
                bp[f"bn{ci}"] = p
                bs[f"bn{ci}"] = s
            if b == 0:
                bp["ds_conv"] = {"kernel": _k(sd[f"layer{li}.{b}.downsample.0.weight"])}
                p, s = _bn(f"layer{li}.{b}.downsample.1", sd)
                bp["ds_bn"] = p
                bs[f"ds_bn"] = s
            lp[f"block{b}"] = bp
            ls[f"block{b}"] = bs
        params[f"layer{li}"] = lp
        stats[f"layer{li}"] = ls

    return {"params": params, "batch_stats": stats}


def load_teacher_from_torch(path: str) -> dict:
    """Load a torchvision resnet50 checkpoint file into teacher variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_resnet50(sd)
