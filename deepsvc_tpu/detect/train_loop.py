"""Detection + semantic-layer training driver.

The reference trains this stage under mmtracking's tools/train.py with
MMDistributedDataParallel (SURVEY.md §2.6); here it is a plain jitted
update over the same loss surface (detect/train.py):

    beta * detection losses + fea_weight * distillation + bpp + aux

The teacher and the I-frame path are frozen; trainable parts are the
student (feature codec + stages 2-4), neck, RPN and RoI head.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..train.optim import label_params
from ..train.trainer import TrainState
from .detector import FEA_TO_BETA, SELSADetector
from .train import semantic_detection_loss


@dataclass
class DetectionTrainConfig:
    fea_weight: float = 20.0
    lr: float = 1e-4
    aux_lr: float = 1e-3
    clip: float = 1.0
    seed: int = 16

    @property
    def beta(self) -> float:
        return float(FEA_TO_BETA.get(int(self.fea_weight), 16))


class DetectionTrainer:
    def __init__(self, cfg: DetectionTrainConfig, detector: SELSADetector,
                 variables, teacher_apply):
        """teacher_apply: frozen fn(x_norm) -> teacher stage outputs."""
        self.cfg = cfg
        self.detector = detector
        self.teacher_apply = teacher_apply

        self.tx = optax.multi_transform(
            {
                "main": optax.chain(optax.clip(cfg.clip), optax.adam(cfg.lr)),
                "aux": optax.adam(cfg.aux_lr),
            },
            label_params(variables),
        )
        self.state = TrainState.create(variables, self.tx, jax.random.PRNGKey(cfg.seed))

        @jax.jit
        def step(state: TrainState, x_norm, supp, memo_maps, ref_feats,
                 teacher_outs, gt_boxes, gt_labels, gt_valid):
            rng, sub = jax.random.split(state.rng)
            img_hw = (x_norm.shape[1], x_norm.shape[2])

            def loss_fn(params):
                total, metrics = semantic_detection_loss(
                    detector, params, x_norm, supp, memo_maps, ref_feats,
                    teacher_outs, gt_boxes, gt_labels, gt_valid, img_hw, sub,
                    fea_weight=cfg.fea_weight, beta=cfg.beta,
                )
                aux = detector.apply(
                    params,
                    method=lambda m: m.student.aux_loss(),
                )
                return total + aux, {**metrics, "aux": aux, "loss": total + aux}

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state, rng=rng),
                metrics,
            )

        self._step = step

    def train_frame(self, x_norm, supp, memo_maps, ref_feats, teacher_outs,
                    gt_boxes, gt_labels, gt_valid) -> dict:
        self.state, metrics = self._step(
            self.state, x_norm, supp, memo_maps, ref_feats, teacher_outs,
            gt_boxes, gt_labels, gt_valid,
        )
        return {k: float(v) for k, v in metrics.items()}
