"""RD evaluation over real bitstreams (test_video.py:197-515 parity).

GOP-12 protocol: frame 0 / every 12th frame is an I-frame through the
image codec; P-frames go through the semantic layer (optional) and the
P-frame codec; the decoded frame and recurrent feature feed the next
frame.  Metrics and the output JSON schema mirror the reference's
(~26 series: PSNR/MS-SSIM/bpp split i/p/mv/res/sm + enc/dec timings).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.image import Normalizer, crop_to_size, pad_to_multiple, psnr
from ..models.codec_runtime import CodecRuntime
from ..models.pframe_runtime import PFrameRuntime
from ..models.semantic_runtime import SemanticRuntime
from ..ops import ms_ssim


@dataclass
class FrameMetrics:
    kind: str  # "I" | "P"
    psnr: float
    msssim: float
    bpp: float
    bpp_wo_sm: float
    enc_time: float
    dec_time: float
    mv_bpp: float = 0.0
    res_bpp: float = 0.0
    sm_bpp: float = 0.0
    warp_psnr: float = 0.0
    mc_psnr: float = 0.0
    warp_msssim: float = 0.0
    mc_msssim: float = 0.0
    sm_enc: float = 0.0
    sm_dec: float = 0.0


class GOPEvaluator:
    """Runs the codec stack over one sequence of frames."""

    def __init__(
        self,
        i_runtime: CodecRuntime,
        p_runtime: PFrameRuntime,
        sm_runtime: SemanticRuntime | None = None,
        teacher_apply=None,  # jitted fn(x_norm)->outs for I-frame support
        gop: int = 12,
        sm_channels: int = 256,
        pad_multiple: int = 64,
        multi_supp: bool = True,  # SemanticConfig.multi_supp (the reference
        # reads SELSA.multi_supp without assigning it; True = aggregate over
        # the full support FIFO, False = most recent support only)
    ):
        self.i_rt = i_runtime
        self.p_rt = p_runtime
        self.sm_rt = sm_runtime
        self.teacher_apply = teacher_apply
        self.gop = gop
        self.sm_channels = sm_channels
        self.pad_multiple = pad_multiple
        self.multi_supp = multi_supp
        self.normalizer = Normalizer()

    def _zeros_sm(self, shape):
        B, H, W, _ = shape
        return jnp.zeros((B, H // 4, W // 4, self.sm_channels), jnp.float32)

    def evaluate_sequence(self, frames_iter, org_size, max_frames=96):
        """frames_iter yields (H, W, 3) float [0,1] numpy frames."""
        metrics: list[FrameMetrics] = []
        ref = None
        feature = None
        supp = None
        org_h, org_w = org_size

        for i, frame in enumerate(frames_iter):
            if i >= max_frames:
                break
            x_org = jnp.asarray(frame)[None]
            x = pad_to_multiple(x_org, self.pad_multiple)
            num_pixels = org_h * org_w

            if i % self.gop == 0:
                feature = None
                t0 = time.perf_counter()
                bs = self.i_rt.compress(x)
                jax.block_until_ready(self.i_rt._last_encode["y_packed"])
                enc_t = time.perf_counter() - t0
                t0 = time.perf_counter()
                dec = self.i_rt.decompress(bs)
                x_hat = jnp.clip(dec["x_hat"], 0.0, 1.0)
                jax.block_until_ready(x_hat)
                dec_t = time.perf_counter() - t0

                bpp = bs.num_bytes * 8.0 / num_pixels
                rec = crop_to_size(x_hat, (org_h, org_w))
                m = FrameMetrics(
                    kind="I",
                    psnr=float(psnr(x_org, rec)),
                    msssim=float(ms_ssim(x_org, rec)),
                    bpp=bpp,
                    bpp_wo_sm=bpp,
                    enc_time=enc_t,
                    dec_time=dec_t,
                )
                ref = x_hat
                if self.sm_rt is not None and self.teacher_apply is not None:
                    x_n = self.normalizer(ref * 255.0)
                    smi = self.teacher_apply(x_n)
                    supp = jnp.stack([smi[0], smi[0]])  # 2-entry FIFO
            else:
                sm_bpp = 0.0
                if self.sm_rt is not None and supp is not None:
                    from ..core.factory import select_support

                    x_n = self.normalizer(x * 255.0)
                    outs, fea, sm_bs = self.sm_rt.encode_decode(
                        x_n, select_support(supp, self.multi_supp)
                    )
                    sm_fea = outs[0]
                    supp = jnp.concatenate([supp[1:], sm_fea[None]], axis=0)
                    sm_bpp = sm_bs.num_bytes * 8.0 / num_pixels
                else:
                    sm_fea = self._zeros_sm(x.shape)

                t0 = time.perf_counter()
                mv_bs, res_bs = self.p_rt.compress(ref, x, sm_fea, feature)
                jax.block_until_ready(self.p_rt.res_rt._last_encode["y_packed"])
                enc_t = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = self.p_rt.decompress(ref, mv_bs, res_bs, sm_fea, feature)
                jax.block_until_ready(out["recon"])
                dec_t = time.perf_counter() - t0

                mv_bpp = mv_bs.num_bytes * 8.0 / num_pixels
                res_bpp = res_bs.num_bytes * 8.0 / num_pixels
                rec = crop_to_size(out["recon"], (org_h, org_w))
                warped = crop_to_size(out["warped"], (org_h, org_w))
                predicted = crop_to_size(out["predict_frame"], (org_h, org_w))
                m = FrameMetrics(
                    kind="P",
                    psnr=float(psnr(x_org, rec)),
                    msssim=float(ms_ssim(x_org, rec)),
                    bpp=mv_bpp + res_bpp + sm_bpp,
                    bpp_wo_sm=mv_bpp + res_bpp,
                    enc_time=enc_t + (self.sm_rt.enc_time if self.sm_rt else 0.0),
                    dec_time=dec_t + (self.sm_rt.dec_time if self.sm_rt else 0.0),
                    mv_bpp=mv_bpp,
                    res_bpp=res_bpp,
                    sm_bpp=sm_bpp,
                    warp_psnr=float(psnr(x_org, warped)),
                    mc_psnr=float(psnr(x_org, predicted)),
                    warp_msssim=float(ms_ssim(x_org, warped)),
                    mc_msssim=float(ms_ssim(x_org, predicted)),
                    sm_enc=self.sm_rt.enc_time if self.sm_rt else 0.0,
                    sm_dec=self.sm_rt.dec_time if self.sm_rt else 0.0,
                )
                ref = out["recon"]
                feature = out["feature"]
            metrics.append(m)
        return metrics


def aggregate(metrics: list[FrameMetrics]) -> dict:
    """Reference-schema aggregates for one sequence (test_video.py:442-452)."""
    i_ms = [m for m in metrics if m.kind == "I"]
    p_ms = [m for m in metrics if m.kind == "P"]

    def avg(vals):
        return float(np.mean(vals)) if len(vals) else 0.0

    return {
        "psnr": avg([m.psnr for m in metrics]),
        "bpp": avg([m.bpp for m in metrics]),
        "msssim": avg([m.msssim for m in metrics]),
        "ipsnr": avg([m.psnr for m in i_ms]),
        "ibpp": avg([m.bpp for m in i_ms]),
        "imsssim": avg([m.msssim for m in i_ms]),
        "ppsnr": avg([m.psnr for m in p_ms]),
        "pbpp": avg([m.bpp for m in p_ms]),
        # key name matches the reference schema verbatim, typo included
        # (test_video.py:446 "porposed_pbpp_wosm")
        "porposed_pbpp_wosm": avg([m.bpp_wo_sm for m in p_ms]),
        "pmsssim": avg([m.msssim for m in p_ms]),
        "mcpsnr": avg([m.mc_psnr for m in p_ms]),
        "warppsnr": avg([m.warp_psnr for m in p_ms]),
        "mvbpp": avg([m.mv_bpp for m in p_ms]),
        "resbpp": avg([m.res_bpp for m in p_ms]),
        "mcmsssim": avg([m.mc_msssim for m in p_ms]),
        "warmsssim": avg([m.warp_msssim for m in p_ms]),
        "ienc": avg([m.enc_time for m in i_ms]),
        "idec": avg([m.dec_time for m in i_ms]),
        "pent": avg([m.enc_time for m in p_ms]),
        "pdec": avg([m.dec_time for m in p_ms]),
        "ent": avg([m.enc_time for m in metrics]),
        "dec": avg([m.dec_time for m in metrics]),
        "smbpp": avg([m.sm_bpp for m in p_ms]),
        "sment": avg([m.sm_enc for m in p_ms]),
        "smdec": avg([m.sm_dec for m in p_ms]),
        "bpp2l": avg(
            [m.bpp for m in i_ms] + [m.mv_bpp + m.sm_bpp for m in p_ms]
        ),
    }


def write_results(path: str, name: str, per_seq: dict[str, dict],
                  conditions: dict | None = None):
    """Per-dataset JSON mirroring the reference layout
    (test_video.py:453-460).  ``conditions`` states what was actually
    measured (data source, resolution, frames, seed) so a synthetic smoke
    eval can never masquerade as a reference-protocol artifact."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = next(iter(per_seq.values())).keys() if per_seq else []
    results = {k: [per_seq[s][k] for s in per_seq] for k in keys}
    output = {"name": name, "description": "Inference (rans)", "results": results}
    if conditions:
        output["conditions"] = conditions
    with open(path, "w", encoding="utf-8") as f:
        json.dump(output, f, indent=2)
    return output


def write_aggregate(path: str, name: str, per_lambda: list[dict]):
    """Across-lambda aggregate: one list entry per rate point, each the
    sequence-average of that lambda's per-sequence series
    (test_video.py:495-513 {tgt}_{INDICATOR}.json)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = per_lambda[0]["results"].keys() if per_lambda else []
    results = {
        k: [float(np.mean(out["results"][k])) for out in per_lambda] for k in keys
    }
    output = {"name": name, "description": "Inference (rans)", "results": results}
    conds = [out.get("conditions") for out in per_lambda]
    if conds and conds[0]:
        output["conditions"] = conds[0]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(output, f, indent=2)
    return output
