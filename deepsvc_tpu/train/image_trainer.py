"""I-frame image codec trainer.

The reference consumes externally-trained I-codec checkpoints
(test_video.py:254-265 loads "ICIP2020ResB" weights; the training recipe
is the standard learned-image-compression one).  This trainer makes the
framework self-contained: loss = lambda * 255^2 * MSE + bpp (or
lambda * (1 - MS-SSIM) + bpp) with the same dual-optimizer split as the
video trainer.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..models.image_codec import ImageCodec
from ..models.pframe import bpp_from_likelihoods
from ..ops import ms_ssim
from .optim import make_optimizer
from .trainer import TrainState


@dataclass
class ImageTrainConfig:
    lmbda: float = 0.0483          # I-codec lambda (RATE_POINTS i_lambda_mse)
    metric: str = "mse"
    lr: float = 1e-4
    aux_lr: float = 1e-3
    clip: float = 1.0
    seed: int = 16


class ImageCodecTrainer:
    def __init__(self, cfg: ImageTrainConfig, model: ImageCodec | None = None,
                 init_shape=(256, 256)):
        self.cfg = cfg
        self.model = model or ImageCodec()
        rng = jax.random.PRNGKey(cfg.seed)
        x = jnp.zeros((1,) + tuple(init_shape) + (3,))
        # jitted init: one dispatch instead of per-op round trips
        self.variables = jax.jit(
            lambda r: self.model.init(
                {"params": r}, x, rng=jax.random.PRNGKey(cfg.seed + 1)
            )
        )(rng)
        self.tx = make_optimizer(self.variables, cfg.lr, cfg.aux_lr, cfg.clip)
        jax.block_until_ready(self.variables)
        self.state = jax.jit(
            lambda v: TrainState.create(v, self.tx,
                                        jax.random.PRNGKey(cfg.seed + 2))
        )(self.variables)
        jax.block_until_ready(self.state)

        # lmbda is a TRACED scalar: every rate point shares one compiled
        # step (a full-size compile is minutes over the dev relay)
        @jax.jit
        def step(state: TrainState, batch, lmbda):
            rng, sub = jax.random.split(state.rng)

            def loss_fn(params):
                out = self.model.apply(params, batch, rng=sub, training=True)
                num_pixels = batch.shape[0] * batch.shape[1] * batch.shape[2]
                bpp = bpp_from_likelihoods(out["likelihoods"], num_pixels)
                if cfg.metric == "msssim":
                    dist = 1.0 - ms_ssim(out["x_hat"], batch)
                    rd = lmbda * dist
                else:
                    dist = jnp.mean((out["x_hat"] - batch) ** 2)
                    rd = lmbda * (255.0**2) * dist
                aux = self.model.apply(params, method=self.model.aux_loss)
                loss = rd + bpp + aux
                return loss, {"loss": loss, "distortion": dist, "bpp": bpp,
                              "aux": aux}

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state, rng=rng),
                metrics,
            )

        self._step = step

    def train_batch(self, batch) -> dict:
        """batch (B, H, W, 3) in [0,1]."""
        self.state, metrics = self._step(self.state, batch, self.cfg.lmbda)
        return {k: float(v) for k, v in metrics.items()}
