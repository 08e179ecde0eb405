"""Semantic-layer + detection training losses (reference
temporal_roi_align.py:147-401 ``forward_train``).

Total loss per the reference (temporal_roi_align.py:367-385):

    beta * (rpn_cls + rpn_reg + roi_cls + roi_reg)
    + fea_weight * mse(teacher stage-4, student stage-4)     (distillation)
    + bpp(semantic feature codec likelihoods)
    + aux (entropy bottleneck quantile loss)

with (fea_weight, beta) from the rate-point schedule (FEA_TO_BETA /
config.RATE_POINTS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.pframe import bpp_from_likelihoods


def semantic_detection_loss(
    detector,            # SELSADetector module
    variables,
    x_norm,              # current P-frame, Process-normalized (B, H, W, 3)
    supp,                # (S, B, H/4, W/4, 256) support features
    memo_maps,           # (T, Hf, Wf, C) neck maps of support frames
    ref_proposal_feats,  # (R_ref, P, P, C)
    teacher_outs,        # frozen teacher stage outputs for distillation
    gt_boxes, gt_labels, gt_valid,
    img_hw,
    rng,
    fea_weight: float = 20.0,
    beta: float = 16.0,
):
    """Returns (total_loss, metrics) for one P-frame training step."""
    rng_codec, rng_det = jax.random.split(rng)
    mt = type(detector)
    p_out = detector.apply(
        variables, x_norm, supp, rng=rng_codec, training=True, method=mt.extract_p
    )
    num_pixels = x_norm.shape[0] * x_norm.shape[1] * x_norm.shape[2]
    bpp = bpp_from_likelihoods(p_out["likelihoods"], num_pixels)

    # distillation: student stage-4 vs frozen teacher stage-4
    # (temporal_roi_align.py:367-385 `fea_mse`)
    if teacher_outs is not None:
        fea_mse = jnp.mean(
            (p_out["s4"] - jax.lax.stop_gradient(teacher_outs[-1])) ** 2
        )
    else:
        fea_mse = jnp.zeros(())

    det_losses = detector.apply(
        variables, p_out["fmap"][0], memo_maps, ref_proposal_feats,
        gt_boxes, gt_labels, gt_valid, img_hw, rng_det, method=mt.losses,
    )
    det_total = sum(det_losses.values())
    total = beta * det_total + fea_weight * fea_mse + bpp
    metrics = {"det": det_total, "fea_mse": fea_mse, "bpp": bpp, **det_losses}
    return total, metrics
