"""P-frame real-bitstream encode/decode (video_model.py:137-167 parity).

Two latent bitstreams per frame (MV, residual); device stages are jitted
once and interleaved with the host rANS coder.
"""

from __future__ import annotations

import jax
import numpy as np

from .codec_runtime import Bitstream, CodecRuntime
from .image_codec import ConditionalCodec
from .pframe import PFrameCodec


class PFrameRuntime:
    def __init__(self, module: PFrameCodec, variables):
        self.module = module
        self.variables = variables

        mv_def = ConditionalCodec(in_ch=8, N=module.mv_latent, out_ch=2,
                                  dtype=module.dtype)
        res_def = ConditionalCodec(
            in_ch=module.feature_channels + 6,
            N=module.res_latent,
            out_ch=module.feature_channels,
            dtype=module.dtype,
        )
        self.mv_rt = CodecRuntime(mv_def, {"params": variables["params"]["mv_codec"]})
        # the residual encoder never needs its own synthesis (the decoder
        # side reconstructs it); skip the full-res deconv stack
        self.res_rt = CodecRuntime(
            res_def, {"params": variables["params"]["res_codec"]}, encoder_xhat=False
        )

        mt = type(module)
        self._motion = jax.jit(
            lambda v, ref, curr: module.apply(v, ref, curr, method=mt.motion_analysis)
        )
        self._mc = jax.jit(
            lambda v, ref, mv1, sm, feat: module.apply(
                v, ref, mv1, sm, feat, method=mt.mc_stage
            )
        )
        self._res_in = jax.jit(
            lambda v, ref, curr, pf, pfe: module.apply(
                v, ref, curr, pf, pfe, method=mt.res_input
            )
        )
        self._recon = jax.jit(
            lambda v, ref, res1, pfe, wfe: module.apply(
                v, ref, res1, pfe, wfe, method=mt.recon_stage
            )
        )

    def update(self, force: bool = True):
        self.mv_rt.update(force)
        self.res_rt.update(force)

    def compress(self, ref, curr, sm_fea, feature=None):
        """Returns (mv_bitstream, res_bitstream).

        Like the reference encoder (video_model.py:137-151), the decoder
        state is reconstructed on the encoder side so downstream frames
        reference the exact decoded tensors.
        """
        v = self.variables
        mv_in = self._motion(v, ref, curr)
        # dispatch the whole device chain async, then block on symbol
        # pulls — host rANS overlaps the queued MC/residual compute
        mv_enc = self.mv_rt.start_compress(mv_in)
        mc = self._mc(v, ref, mv_enc["x_hat"], sm_fea, feature)
        res_in = self._res_in(v, ref, curr, mc["predict_frame"], mc["predict_fea"])
        res_enc = self.res_rt.start_compress(res_in)
        # overlap all device->host symbol/index transfers
        for enc in (mv_enc, res_enc):
            for k in ("z_sym", "y_packed"):
                enc[k].copy_to_host_async()
        mv_bs = self.mv_rt.finish_compress(mv_enc)
        res_bs = self.res_rt.finish_compress(res_enc)
        return mv_bs, res_bs

    def decompress(self, ref, mv_bs: Bitstream, res_bs: Bitstream, sm_fea,
                   feature=None):
        """Returns dict(feature, recon, warped, predict_frame)
        (video_model.py:153-167).

        The MV and residual latent decodes are data-independent (the
        residual codec is unconditioned), so the two channel-AR chains
        are interleaved: one stream's host rANS round overlaps the
        other's queued device step, and the MC stage is dispatched
        (async) the moment the MV stream completes, overlapping the
        residual stream's remaining host rounds."""
        import jax.numpy as jnp

        v = self.variables
        mv_job = self.mv_rt.start_decompress(mv_bs)
        res_job = self.res_rt.start_decompress(res_bs)
        mc = None
        while not (mv_job.done and res_job.done):
            # overlap the two streams' idx round trips
            mv_job.prefetch()
            res_job.prefetch()
            if not mv_job.done:
                mv_job.advance()
                if mv_job.done:
                    mc = self._mc(v, ref, mv_job.result["x_hat"], sm_fea, feature)
            if not res_job.done:
                res_job.advance()
        self.mv_rt.timings = {**getattr(self.mv_rt, "timings", {}),
                              "dec_steps": mv_job.times}
        self.res_rt.timings = {**getattr(self.res_rt, "timings", {}),
                               "dec_steps": res_job.times}
        feature_out, recon = self._recon(
            v, ref, res_job.result["x_hat"], mc["predict_fea"], mc["warp_fea"]
        )
        return {
            "feature": feature_out,
            "recon": jnp.clip(recon, 0.0, 1.0),
            "warped": jnp.clip(mc["warped"], 0.0, 1.0),
            "predict_frame": jnp.clip(mc["predict_frame"], 0.0, 1.0),
        }
