"""Semantic-aware P-frame trainer (reference Trainer_ICIP2020ResB_WSM_*,
/root/reference/Learner.py:567-1691).

Fine-tunes the structure/texture codec WITH the semantic layer in the
loop: a frozen learned I-codec codes frame 0 (Learner.py:736-737), the
frozen teacher seeds the 2-entry support FIFO from the original first
frame (Learner.py:741-742), and the frozen student produces the semantic
feature for every P-frame (Learner.py:750-751).  Training starts at the
stage-5 boundary (fine-tune mode, Learner.py:644), so the cascade loss
with mc_weight 0.01 applies (v2 semantics, Learner.py:1123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import TrainConfig
from ..core.image import Normalizer
from .trainer import PFrameTrainer


class SemanticPFrameTrainer(PFrameTrainer):
    def __init__(
        self,
        cfg: TrainConfig,
        model,
        i_codec,            # (module, variables) — frozen
        teacher,            # (module, variables) — frozen
        student,            # (module, variables) — frozen
        init_shape=(64, 64),
        start_at_final_stage: bool = True,
    ):
        super().__init__(cfg, model=model, init_shape=init_shape)
        if start_at_final_stage:
            self.state = self.state.replace(
                step=jnp.asarray(int(cfg.stage_steps[3]), jnp.int32)
            )
        self._norm = Normalizer()

        i_mod, i_vars = i_codec
        t_mod, t_vars = teacher
        s_mod, s_vars = student

        @jax.jit
        def prepare(frames, rng):
            """frames (f, B, H, W, 3) -> (ref (B,...), sms (f, B, h, w, 256)).

            All under stop_gradient (the semantic stack is frozen,
            Learner.py:736-751)."""
            f = frames.shape[0]
            i_out = i_mod.apply(i_vars, frames[0], training=False)
            ref = jnp.clip(i_out["x_hat"], 0.0, 1.0)

            smi = t_mod.apply(t_vars, self._norm(frames[0] * 255.0))
            supp = jnp.stack([smi[0], smi[0]])  # 2-entry FIFO

            sms = [jnp.zeros_like(smi[0])]  # slot for frame 0 (unused)
            for t in range(1, f):
                out = s_mod.apply(
                    s_vars,
                    self._norm(frames[t] * 255.0),
                    supp,
                    rng=jax.random.fold_in(rng, t),
                    training=True,  # noisy-codec features, like the reference
                )
                sm = out["outs"][0]
                supp = jnp.concatenate([supp[1:], sm[None]], axis=0)
                sms.append(sm)
            sms = jnp.stack(sms)
            return jax.lax.stop_gradient(ref), jax.lax.stop_gradient(sms)

        self._prepare = prepare

    def train_batch(self, frames, sms=None):
        """frames (f, B, H, W, 3); the first frame is replaced by its
        I-coded reconstruction and sms come from the frozen semantic
        stack (the ``sms`` argument is ignored)."""
        rng, sub = jax.random.split(self.state.rng)
        self.state = self.state.replace(rng=rng)
        ref, sms = self._prepare(frames, sub)
        frames_coded = jnp.concatenate([ref[None], frames[1:]], axis=0)
        return super().train_batch(frames_coded, sms)
