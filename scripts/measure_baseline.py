"""Measure the reference DeepSVC's per-frame transform time with torch-CPU.

VERDICT r2 item 6: bench.py's vs_baseline anchor was prose, not a
measurement.  This script loads the ACTUAL reference model code
(/root/reference/video_model.py, image_model.py — executed in place,
nothing copied) with compressai's entropy-model surface stubbed by
compute-equivalent torch modules (the rANS coder itself cannot run —
compressai is not installed — so we time the forward() transform path,
which LOWER-bounds reference per-frame cost: the real compress/decompress
adds per-slice GPU->CPU .tolist() syncs and host rANS on top,
/root/reference/image_model.py:241-242,276-297).

Protocol notes:
  - torch threads pinned to 1, matching the reference eval protocol
    (/root/reference/test_video.py:16 `torch.set_num_threads(1)`).
  - measured at two sizes to establish per-pixel linear scaling, then
    extrapolated to padded 1080p (1088x1920).
  - P-frame = DeepSVC.forward (flow + mv codec + MC + res codec +
    reconstruction); I-frame = ICIP2020ResB.forward.

Writes BASELINE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
import types

import torch
import torch.nn as nn


def install_stubs():
    """compressai / pytorch_msssim import surface, compute-equivalent."""

    def ste_round(x):
        return torch.round(x)

    class EntropyBottleneck(nn.Module):
        def __init__(self, channels, *a, **k):
            super().__init__()
            self.channels = channels
            self.register_buffer("_medians", torch.zeros(1, channels, 1, 1))

        def _get_medians(self):
            return self._medians

        def forward(self, z):
            z_hat = torch.round(z)
            # likelihood-shaped compute (negligible vs transforms, kept
            # for parity of the returned structure)
            lik = torch.sigmoid(z_hat + 0.5) - torch.sigmoid(z_hat - 0.5)
            return z_hat, lik.clamp_min(1e-9)

    class GaussianConditional(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, y, scales, means=None):
            mu = means if means is not None else torch.zeros_like(y)
            y_hat = torch.round(y - mu) + mu
            v = (y - mu) / scales.clamp_min(0.11)
            lik = torch.sigmoid(v + 0.5) - torch.sigmoid(v - 0.5)
            return y_hat, lik.clamp_min(1e-9)

    def conv(in_ch, out_ch, kernel_size=5, stride=2):
        return nn.Conv2d(in_ch, out_ch, kernel_size, stride=stride,
                         padding=kernel_size // 2)

    def deconv(in_ch, out_ch, kernel_size=5, stride=2):
        return nn.ConvTranspose2d(in_ch, out_ch, kernel_size, stride=stride,
                                  padding=kernel_size // 2,
                                  output_padding=stride - 1)

    def conv3x3(in_ch, out_ch, stride=1):
        return nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)

    def subpel_conv3x3(in_ch, out_ch, r=1):
        return nn.Sequential(
            nn.Conv2d(in_ch, out_ch * r * r, 3, padding=1), nn.PixelShuffle(r)
        )

    def update_registered_buffers(*a, **k):
        pass

    class _Coder:
        def __init__(self, *a, **k):
            pass

    root = types.ModuleType("compressai")
    em = types.ModuleType("compressai.entropy_models")
    em.EntropyBottleneck = EntropyBottleneck
    em.GaussianConditional = GaussianConditional
    layers = types.ModuleType("compressai.layers")
    layers.subpel_conv3x3 = subpel_conv3x3
    layers.conv3x3 = conv3x3
    models = types.ModuleType("compressai.models")
    mutils = types.ModuleType("compressai.models.utils")
    mutils.conv = conv
    mutils.deconv = deconv
    mutils.update_registered_buffers = update_registered_buffers
    ops = types.ModuleType("compressai.ops")
    ops.ste_round = ste_round
    ans = types.ModuleType("compressai.ans")
    ans.BufferedRansEncoder = _Coder
    ans.RansDecoder = _Coder
    models.utils = mutils
    root.entropy_models = em
    root.layers = layers
    root.models = models
    root.ops = ops
    root.ans = ans
    for name, mod in [
        ("compressai", root), ("compressai.entropy_models", em),
        ("compressai.layers", layers), ("compressai.models", models),
        ("compressai.models.utils", mutils), ("compressai.ops", ops),
        ("compressai.ans", ans),
    ]:
        sys.modules[name] = mod

    msssim = types.ModuleType("pytorch_msssim")
    msssim.ms_ssim = lambda a, b, data_range=1.0, size_average=True: torch.tensor(1.0)
    sys.modules["pytorch_msssim"] = msssim

    # torchvision: modules.py only imports `transforms` (unused in the
    # forward paths we time)
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv.transforms


def time_fn(fn, n=3):
    fn()  # warmup
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    torch.set_num_threads(1)  # reference eval protocol (test_video.py:16)
    install_stubs()
    sys.path.insert(0, "/root/reference")
    from image_model import ICIP2020ResB
    from video_model import DeepSVC

    p_model = DeepSVC().eval()
    i_model = ICIP2020ResB().eval()

    sizes = [(256, 448), (448, 832)]
    results = {}
    with torch.no_grad():
        for (h, w) in sizes:
            ref = torch.rand(1, 3, h, w)
            cur = torch.rand(1, 3, h, w)
            sm = torch.rand(1, 256, h // 4, w // 4)
            fea = torch.rand(1, 64, h, w)

            t_p = time_fn(lambda: p_model(ref, cur, sm, fea))
            t_i = time_fn(lambda: i_model(cur))
            results[f"{h}x{w}"] = {
                "p_forward_s": round(t_p, 3),
                "i_forward_s": round(t_i, 3),
                "pixels": h * w,
            }
            print(f"{h}x{w}: P {t_p:.3f}s  I {t_i:.3f}s", flush=True)

    # per-pixel extrapolation to padded 1080p
    (s0, s1) = (results["256x448"], results["448x832"])
    per_px_p = s1["p_forward_s"] / s1["pixels"]
    per_px_i = s1["i_forward_s"] / s1["pixels"]
    px_1080 = 1088 * 1920
    p_1080 = per_px_p * px_1080
    i_1080 = per_px_i * px_1080
    scaling_lin = (s1["p_forward_s"] / s0["p_forward_s"]) / (
        s1["pixels"] / s0["pixels"]
    )
    out = {
        "protocol": "torch-CPU 1 thread, forward() transforms only "
                    "(LOWER bound: real compress/decompress adds per-slice "
                    "syncs + host rANS)",
        "torch_version": torch.__version__,
        "measured": results,
        "scaling_linearity": round(scaling_lin, 3),
        "extrapolated_1080p": {
            "p_forward_s": round(p_1080, 3),
            "i_forward_s": round(i_1080, 3),
            "p_fps": round(1.0 / p_1080, 4),
        },
    }
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["extrapolated_1080p"]))


if __name__ == "__main__":
    main()
