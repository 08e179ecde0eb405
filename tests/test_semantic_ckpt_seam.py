"""train_semantic_stack -> eval-side restore seam.

The r4 campaign's first on-hardware three-layer eval depends on
test_video_tpu.py restoring the {"teacher", "student"} checkpoint that
train_semantic_stack.py writes (reference: semantic student/teacher of
temporal_roi_align.py:98-401 consumed frozen by test_video.py:336-338).
This seam had no coverage: r3's evals always fell back to no-semantic,
so a layout mismatch would only surface mid-campaign as the loud
FileNotFoundError/restore failure.  Trains 1 tiny step on CPU via the
real CLI, then restores with the eval's exact template."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_stack_checkpoint_restores_into_eval_template(tmp_path):
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_semantic_stack.py"),
         "--tiny", "--cpu", "--synthetic", "--steps", "1",
         "--batch-size", "1", "--crop", "64", "--log-root", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepsvc_tpu.core.config import DeepSVCConfig
    from deepsvc_tpu.core.factory import build_student, build_teacher, tiny_config
    from deepsvc_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config(DeepSVCConfig())
    teacher = build_teacher(cfg, depth=26)
    student = build_student(cfg, depth=26)
    x = jnp.zeros((1, 64, 64, 3))
    t_vars = teacher.init(jax.random.PRNGKey(0), x)
    supp0 = jnp.zeros((2, 1, 16, 16, 256))
    s_vars = student.init(
        {"params": jax.random.PRNGKey(0)}, x, supp0, rng=jax.random.PRNGKey(1)
    )
    mgr = CheckpointManager(str(tmp_path / "semantic_320"))
    restored, step = mgr.restore({"teacher": t_vars, "student": s_vars})
    assert restored is not None and step == 1
    # the eval template's tree (default out_indices) must align with the
    # trainer's out_indices=(0, 3) clone — the param tree is
    # out_indices-independent by design
    import jax.tree_util as jtu

    jtu.tree_map(
        lambda a, b: (_ for _ in ()).throw(
            AssertionError(f"{a.shape} != {b.shape}")
        ) if a.shape != b.shape else None,
        restored["student"], s_vars,
    )
