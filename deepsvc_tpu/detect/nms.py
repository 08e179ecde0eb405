"""Non-maximum suppression as a fixed-shape XLA loop.

Native replacement for mmcv's CUDA NMS: scores are pre-sorted, then a
fori_loop greedily keeps boxes, masking later boxes whose IoU with any
kept box exceeds the threshold.  Fixed output size (max_out) with -1
padding keeps shapes static under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bbox import iou_matrix


def nms(boxes, scores, iou_thresh: float = 0.7, max_out: int = 300,
        score_thresh: float = -jnp.inf):
    """Greedy NMS.  Returns (indices (max_out,), valid (max_out,) bool);
    indices refer to the input order, invalid slots are -1."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    ious = iou_matrix(boxes_s, boxes_s)  # (n, n)
    later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]  # strictly-after mask

    alive0 = scores_s > score_thresh
    kept0 = jnp.full((max_out,), -1, jnp.int32)

    def body(i, state):
        alive, kept, count = state
        take = alive[i] & (count < max_out)
        slot = jnp.minimum(count, max_out - 1)
        kept = kept.at[slot].set(jnp.where(take, i, kept[slot]))
        count = count + take.astype(jnp.int32)
        suppress = take & later[i] & (ious[i] > iou_thresh)
        alive = alive & ~suppress
        return alive, kept, count

    _, kept, count = jax.lax.fori_loop(0, n, body, (alive0, kept0, jnp.int32(0)))
    valid = jnp.arange(max_out) < count
    idx = jnp.where(valid & (kept >= 0), order[jnp.maximum(kept, 0)], -1)
    return idx, valid
