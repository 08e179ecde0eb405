"""Checkpoint save/restore via orbax (reference: Learner.py:540-551,
utils.py:160-187).

A checkpoint stores {step, params, opt_state, rng} — the full TrainState
— plus metadata; quantized CDF tables are NOT stored (they are rebuilt
deterministically from params by CodecRuntime.update(), the reference's
``update(force=True)`` after load, test_video.py:235-236).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(state: Any) -> Any:
    """Overlapped device->host pull of the whole tree.

    Handing orbax device arrays makes it fetch leaf-by-leaf; through a
    remote-TPU tunnel each fetch pays ~1s setup, so ~1000 leaves cost
    ~15 min per checkpoint.  Start every transfer async first, then
    materialize — total cost becomes one latency + bandwidth.
    """
    leaves = jax.tree_util.tree_leaves(state)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "copy_to_host_async") else x, state
    )


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None, force=False):
        # A best-val save and a forced periodic save can land on the SAME
        # step (both trigger on the same threshold crossing); orbax raises
        # StepAlreadyExistsError on the second — which killed the round-3
        # phase-1/phase-3 training runs at their first validation step.
        # The state is identical within a step, so the second save is a
        # no-op, not an error.
        if step in (self._mgr.all_steps() or []):
            return
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(_to_host(state)),
            metrics=metrics,
            force=force,
        )
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        # Restore against a HOST (numpy) template, then upload the tree in
        # ONE dispatch-ordered device_put and block.  Handing orbax a
        # device-array template makes its restore pool issue hundreds of
        # concurrent device puts; over the axon tunnel those puts
        # intermittently deadlock (r5: two --init-from runs hung between
        # "initialized from" and the first device pull, kernel stacks all
        # in futex_wait while the tunnel sat idle).
        host_template = _to_host(state_template)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(host_template)
        )
        restored = jax.device_put(restored)
        jax.block_until_ready(restored)
        return restored, step

    def latest_step(self):
        return self._mgr.latest_step()
