"""Trainer tests: stage schedule, optimizer routing, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deepsvc_tpu.core.config import TrainConfig
from deepsvc_tpu.data import make_clip_batch, make_semantic_features
from deepsvc_tpu.models import PFrameCodec
from deepsvc_tpu.train import PFrameTrainer, label_params, make_optimizer, stage_info


class TestStageSchedule:
    def test_bands(self):
        cfg = TrainConfig()
        assert stage_info(0, cfg).band == 1
        assert stage_info(0, cfg).frames == 2
        assert stage_info(0, cfg).warp_weight == pytest.approx(0.1)
        assert stage_info(350_000, cfg).band == 2
        assert stage_info(350_000, cfg).warp_weight == 0.0
        assert stage_info(450_000, cfg).frames == 4
        assert stage_info(550_000, cfg).frames == 7
        s5 = stage_info(650_000, cfg)
        assert s5.band == 5 and s5.frames == 5 and s5.cascade
        assert s5.mc_weight == pytest.approx(0.01)


class TestOptimizerRouting:
    def test_quantiles_labeled_aux(self):
        params = {
            "params": {
                "codec": {"entropy_bottleneck": {"quantiles": jnp.zeros((4, 1, 3))}},
                "conv": {"kernel": jnp.zeros((3, 3))},
            }
        }
        labels = label_params(params)
        assert labels["params"]["codec"]["entropy_bottleneck"]["quantiles"] == "aux"
        assert labels["params"]["conv"]["kernel"] == "main"

    def test_lr_split_applied(self):
        params = {
            "q": {"quantiles": jnp.ones((2,))},
            "w": {"kernel": jnp.ones((2,))},
        }
        tx = make_optimizer(params, lr=1e-4, aux_lr=1e-3, clip=1.0)
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        # adam step size ~ lr for constant unit grads
        assert abs(float(updates["q"]["quantiles"][0])) > 5e-4
        assert abs(float(updates["w"]["kernel"][0])) < 5e-4


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = TrainConfig(batch_size=1, lambda_rd=640, stage_steps=(4, 8, 12, 16, 20),
                      frames_per_stage=(2, 3, 3, 3))
    model = PFrameCodec(mv_latent=16, res_latent=16)
    return PFrameTrainer(cfg, model=model, init_shape=(64, 64))


@pytest.mark.slow
class TestPFrameTrainer:
    def test_training_reduces_loss(self, tiny_trainer, rng):
        tr = tiny_trainer
        frames = jnp.asarray(make_clip_batch(rng, frames=3, batch=1, height=64, width=64))
        sms = jnp.asarray(make_semantic_features(rng, 3, 1, 64, 64))
        losses = []
        for _ in range(8):
            m = tr.train_batch(frames, sms)
            losses.append(m["loss"])
            assert np.isfinite(m["loss"])
        # training on a fixed batch must reduce loss
        assert losses[-1] < losses[0]

    def test_stage_transition_cascade(self, tiny_trainer, rng):
        tr = tiny_trainer
        frames = jnp.asarray(make_clip_batch(rng, frames=3, batch=1, height=64, width=64))
        sms = jnp.asarray(make_semantic_features(rng, 3, 1, 64, 64))
        # drive past the final stage boundary: cascade steps increment by 1
        while int(tr.state.step) < 18:
            m = tr.train_batch(frames, sms)
        assert np.isfinite(m["loss"])
        assert len(tr._cascade_step_cache) > 0
