"""Dual-optimizer setup (main + entropy-quantile aux) and LR schedule.

The reference trains two Adam optimizers: one over every parameter not
named ``*.quantiles`` (lr 1e-4, per-element grad clamp +-1) and one over
the quantiles (lr 1e-3) driven by the entropy models' aux loss
(/root/reference/Learner.py:553-564).  Here both losses are summed into
a single backward pass — the aux loss stops gradients to non-quantile
parameters (entropy/bottleneck.py), so an optax multi_transform routing
by parameter name reproduces the exact same update split.

LR schedule (Learner.py:525-538): /2 after stage3, /5 after stage4, /10
after stage4 + 60k steps.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def label_params(params) -> dict:
    """'aux' for entropy-model quantiles, 'main' for everything else."""

    def label(path, _):
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        return "aux" if "quantiles" in names else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def lr_schedule(base_lr: float, stage_steps: Sequence[int]) -> optax.Schedule:
    """Piecewise-constant: /2 > stage3, /5 > stage4, /10 > stage4+60k."""
    stage3, stage4 = stage_steps[2], stage_steps[3]
    return optax.piecewise_constant_schedule(
        base_lr,
        {int(stage3): 0.5, int(stage4): 0.4, int(stage4 + 60_000): 0.5},
    )


def make_optimizer(
    params,
    lr: float = 1e-4,
    aux_lr: float = 1e-3,
    clip: float = 1.0,
    stage_steps: Sequence[int] = (300_000, 400_000, 500_000, 600_000, 700_000),
) -> optax.GradientTransformation:
    sched = lr_schedule(lr, stage_steps)
    aux_sched = lr_schedule(aux_lr, stage_steps)
    main = optax.chain(optax.clip(clip), optax.adam(sched))
    aux = optax.adam(aux_sched)
    return optax.multi_transform({"main": main, "aux": aux}, label_params(params))
