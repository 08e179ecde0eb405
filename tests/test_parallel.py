"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deepsvc_tpu.core.config import TrainConfig
from deepsvc_tpu.data import make_clip_batch, make_semantic_features
from deepsvc_tpu.models import PFrameCodec, init_pframe_variables
from deepsvc_tpu.parallel import make_mesh, make_dp_cascade_step, replicate, shard_leading_axis
from deepsvc_tpu.train import PFrameTrainer, TrainState, make_optimizer


def test_eight_virtual_devices(cpu_devices):
    assert len(cpu_devices) == 8


class TestMesh:
    def test_make_mesh_shapes(self, cpu_devices):
        mesh = make_mesh(data=4, space=2, devices=cpu_devices)
        assert mesh.shape == {"data": 4, "space": 2}
        mesh = make_mesh(devices=cpu_devices)
        assert mesh.shape == {"data": 8, "space": 1}

    def test_shard_leading_axis(self, cpu_devices):
        mesh = make_mesh(data=8, devices=cpu_devices)
        x = jnp.zeros((8, 4, 4, 3))
        xs = shard_leading_axis(x, mesh)
        assert len(xs.sharding.device_set) == 8


class TestDataParallelTraining:
    @pytest.mark.slow
    def test_dp_cascade_step_runs_and_matches_single(self, rng, cpu_devices):
        """DP over 4 devices == single-device result (deterministic)."""
        mesh = make_mesh(data=4, space=1, devices=cpu_devices)
        model = PFrameCodec(mv_latent=16, res_latent=16)
        variables = init_pframe_variables(model, jax.random.PRNGKey(0), H=32, W=32)
        tx = make_optimizer(variables, lr=1e-4, aux_lr=1e-3)
        state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

        frames = jnp.asarray(make_clip_batch(rng, frames=3, batch=4, height=32, width=32))
        sms = jnp.asarray(make_semantic_features(rng, 3, 4, 32, 32))

        step = make_dp_cascade_step(model, tx, mesh, frames_n=3, lambda_rd=640)
        state_r = replicate(state, mesh)
        frames_s = shard_leading_axis(frames, mesh, axis=1)
        sms_s = shard_leading_axis(sms, mesh, axis=1)
        new_state, metrics = step(state_r, frames_s, sms_s)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

        # single-device reference result
        mesh1 = make_mesh(data=1, space=1, devices=cpu_devices[:1])
        step1 = make_dp_cascade_step(model, tx, mesh1, frames_n=3, lambda_rd=640)
        state1 = replicate(state, mesh1)
        new1, metrics1 = step1(state1, frames, sms)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics1["loss"]), rtol=2e-4
        )

    @pytest.mark.slow
    def test_spatial_sharding_conv_forward(self, rng, cpu_devices):
        """Spatially-sharded eval forward (XLA inserts conv halos)."""
        from deepsvc_tpu.models import ImageCodec

        mesh = make_mesh(data=1, space=4, devices=cpu_devices)
        m = ImageCodec(N=16, M=20, num_slices=4, max_support_slices=2)
        x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1))

        fwd = jax.jit(lambda v, x: m.apply(v, x, training=False))
        x = jax.device_put(x, cpu_devices[0])
        variables = jax.device_put(variables, cpu_devices[0])
        out_plain = fwd(variables, x)

        x_sharded = jax.device_put(x, NamedSharding(mesh, P(None, "space", None, None)))
        v_repl = replicate(variables, mesh)
        out_sharded = fwd(v_repl, x_sharded)
        np.testing.assert_allclose(
            np.asarray(out_plain["x_hat"]), np.asarray(out_sharded["x_hat"]),
            atol=2e-5,
        )
