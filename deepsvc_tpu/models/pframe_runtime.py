"""P-frame real-bitstream encode/decode (video_model.py:137-167 parity).

Two latent bitstreams per frame (MV, residual); device stages are jitted
once and interleaved with the host rANS coder.
"""

from __future__ import annotations

import jax
import numpy as np

from .codec_runtime import Bitstream, CodecRuntime, _concat_flat_n
from .image_codec import ConditionalCodec
from .pframe import PFrameCodec


# one flat uint8 buffer from two jobs' per-round index tensors: a single
# device->host pull serves both chains (see PFrameDecodeJob.step)
_concat_flat = jax.jit(
    lambda a, b: jax.numpy.concatenate([a.reshape(-1), b.reshape(-1)])
)



class PFrameRuntime:
    def __init__(self, module: PFrameCodec, variables):
        # DEEPSVC_PALLAS=1 routes qualifying 3x3 transform convs through
        # the pallas kernel (ops/pallas_conv.py).  Opt-in: measured
        # in-context, XLA's fusion already reaches ~54 TF/s on these
        # chains and the v1 kernel's per-call pad/copy boundaries lose
        # (bench_mod_r3: FeatureExtraction 17.2 ms XLA vs 34.2 pallas).
        import os

        if os.environ.get("DEEPSVC_PALLAS"):
            from ..ops import pallas_conv

            pallas_conv.enable()
        self.module = module
        self.variables = variables

        slice_kw = {}
        if module.cond_num_slices is not None:
            slice_kw["num_slices"] = module.cond_num_slices
        if module.cond_max_support_slices is not None:
            slice_kw["max_support_slices"] = module.cond_max_support_slices
        mv_def = ConditionalCodec(in_ch=8, N=module.mv_latent, out_ch=2,
                                  dtype=module.dtype, **slice_kw)
        res_def = ConditionalCodec(
            in_ch=module.feature_channels + 6,
            N=module.res_latent,
            out_ch=module.feature_channels,
            dtype=module.dtype,
            **slice_kw,
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
        # encoder-only analysis programs (big fused dispatches); the rest
        # of the encode drives the decoder's executables so encoder and
        # decoder state agree bitwise (codec_runtime.start_compress).
        # Decode tails stay merged with MC / reconstruction — every
        # dispatch pays fixed relay/PCIe latency.
        self._enc_mv = jax.jit(
            lambda v, ref, curr: module.apply(
                v, ref, curr, method=mt.encode_mv_analysis
            )
        )
        self._enc_res = jax.jit(
            lambda v, ref, curr, pf, pfe: module.apply(
                v, ref, curr, pf, pfe, method=mt.encode_res_analysis
            )
        )
        self._mv_finish_mc = jax.jit(
            lambda v, means, prev, mu, syms, ref, sm, feat: module.apply(
                v, means, prev, mu, syms, ref, sm, feat, method=mt.mv_finish_mc
            )
        )
        self._res_finish_recon = jax.jit(
            lambda v, means, prev, mu, syms, ref, pfe, wfe: module.apply(
                v, means, prev, mu, syms, ref, pfe, wfe,
                method=mt.res_finish_recon,
            )
        )

    def update(self, force: bool = True):
        self.mv_rt.update(force)
        self.res_rt.update(force)

    def _encode_exact(self, ref, curr, sm_fea, feature, with_recon,
                      pump=None):
        """Encode by driving the decoder's own executables (async, no
        host sync): MV analysis -> MV entropy chain ending in the SAME
        mv_finish_mc dispatch the decoder runs -> residual analysis ->
        residual chain (ending in res_finish_recon when ``with_recon``).
        Identical executables + identical inputs make every symbol,
        index and reconstructed tensor bitwise equal to the decoder's.

        ``pump``: optional callable advanced between dispatch groups so a
        concurrent decode job's host rounds interleave with this encode's
        queued device work (codec_runtime.drive_exact)."""
        v = self.variables
        a_mv = self._enc_mv(v, ref, curr)
        if pump is not None:
            pump()
        mv_enc = self.mv_rt.drive_exact(
            a_mv, None,
            finish_fn=lambda means, prev, mu, syms, cond: self._mv_finish_mc(
                v, means, prev, mu, syms, ref, sm_fea, feature
            ),
            pump=pump,
        )
        mc = mv_enc["fin"]["mc"]
        a_res = self._enc_res(v, ref, curr, mc["predict_frame"],
                              mc["predict_fea"])
        if pump is not None:
            pump()
        if with_recon:
            res_enc = self.res_rt.drive_exact(
                a_res, None,
                finish_fn=lambda means, prev, mu, syms, cond:
                    self._res_finish_recon(
                        v, means, prev, mu, syms, ref,
                        mc["predict_fea"], mc["warp_fea"]
                    ),
                pump=pump,
            )
        else:
            # symbols/indexes do not depend on the tail reconstruction;
            # the serial protocol takes recon/feature from the decode
            res_enc = self.res_rt.drive_exact(a_res, None, with_finish=False,
                                              pump=pump)
        h = {"mv_enc": mv_enc, "res_enc": res_enc}
        if with_recon:
            h["recon"] = res_enc["fin"]["recon"]
            h["feature"] = res_enc["fin"]["feature"]
        for enc in (mv_enc, res_enc):
            for k in ("z_sym", "y_packed"):
                enc[k].copy_to_host_async()
            # Release the full-res tail tensors: finish_compress needs
            # only z_sym/y_packed/y_sym/y_shape (+ y_hat for the
            # encoder-side bit-exactness checks).  mc's predict_fea/
            # warp_fea and the residual x_hat are ~267 MB each at 1080p
            # bf16 — holding them across the bench's one-frame lookahead
            # window OOMed the chip (RESOURCE_EXHAUSTED, r3 campaign).
            enc.pop("fin", None)
            enc.pop("x_hat", None)
        return h

    def compress_pipelined(self, ref, curr, sm_fea, feature=None, pump=None):
        """Encode AND reconstruct the decoder state fully on the encoder
        side (async dispatch; nothing blocks).

        Unlike compress(), the residual synthesis + texture recon run on
        the encoder too, so frame t+1's encode can start from the
        returned (recon, feature) WITHOUT waiting for frame t's decode —
        the encoder stream runs ahead while the decoder stream's host
        rANS rounds hide under encoder device compute (the bench's
        pipelined mode; VERDICT r2 item 2).

        ``pump``: pass the in-flight decode job's ``step`` so its host
        rounds interleave with this encode's dispatch groups (dispatch-
        order-only change; see codec_runtime.drive_exact).  Without it,
        TPU in-order execution queues every decode round behind the whole
        encode and pipelining hides only the first round's stall.

        Returns dict(mv_enc, res_enc, recon, feature); call
        finish(handles) to pull symbols and produce the bitstreams.
        recon/feature are BITWISE what the decoder will reconstruct
        (_encode_exact), so the recurrent streams cannot drift.
        """
        return self._encode_exact(ref, curr, sm_fea, feature, True, pump=pump)

    def finish(self, handles) -> tuple:
        """Block on symbol pulls + host rANS for a compress_pipelined()."""
        mv_bs = self.mv_rt.finish_compress(handles["mv_enc"])
        res_bs = self.res_rt.finish_compress(handles["res_enc"])
        return mv_bs, res_bs

    def compress(self, ref, curr, sm_fea, feature=None):
        """Returns (mv_bitstream, res_bitstream).

        Like the reference encoder (video_model.py:137-151), the decoder
        state the residual depends on (decoded MV -> MC) is reconstructed
        on the encoder side — with the decoder's executables, so it is
        bitwise the decoder's state.  The final synthesis/recon is
        skipped (the serial protocol takes them from decode)."""
        h = self._encode_exact(ref, curr, sm_fea, feature, False)
        mv_bs = self.mv_rt.finish_compress(h["mv_enc"])
        res_bs = self.res_rt.finish_compress(h["res_enc"])
        return mv_bs, res_bs

    def start_decompress(self, ref, mv_bs: Bitstream, res_bs: Bitstream,
                         sm_fea, feature=None) -> "PFrameDecodeJob":
        """Resumable decode: drive with job.step() until job.done, then
        read job.result.  Lets callers overlap this frame's host rANS
        rounds with other queued device work (next frame's encode)."""
        return PFrameDecodeJob(self, ref, mv_bs, res_bs, sm_fea, feature)

    def decompress(self, ref, mv_bs: Bitstream, res_bs: Bitstream, sm_fea,
                   feature=None):
        """Returns dict(feature, recon, warped, predict_frame)
        (video_model.py:153-167).

        The MV and residual latent decodes are data-independent (the
        residual codec is unconditioned), so the two channel-AR chains
        are interleaved: one stream's host rANS round overlaps the
        other's queued device step.  The MC stage rides the MV stream's
        tail dispatch and the reconstruction rides the residual stream's
        tail dispatch (PFrameCodec.mv_finish_mc / res_finish_recon), so
        a full frame decode costs max_support_slices + 1 dispatches
        total."""
        job = self.start_decompress(ref, mv_bs, res_bs, sm_fea, feature)
        while not job.step():
            pass
        self.mv_rt.timings = {**getattr(self.mv_rt, "timings", {}),
                              "dec_steps": job.mv_job.times}
        self.res_rt.timings = {**getattr(self.res_rt, "timings", {}),
                               "dec_steps": job.res_job.times}
        return job.result

    def decompress_gop(self, ref, streams, sm_fea, feature=None):
        """Decode a stored run of P-frames with their entropy chains
        INTERLEAVED across frames (serving path; no reference analog —
        the reference decodes strictly frame-by-frame,
        video_model.py:153-167).

        The channel-AR chains are data-independent across frames (the
        recurrent conditioning enters only at the MC/reconstruction
        tails), so every frame's per-round index tensors are
        concatenated on device and ride ONE device->host pull per round:
        the host-sync cost of a GOP drops from
        frames x (max_support_slices+1) pulls to max_support_slices+1.
        The MC/recon tails then run in frame order — pure queued device
        work, no host rounds.

        ``streams``: list of (mv_bs, res_bs) for consecutive P-frames.
        Returns a list of per-frame result dicts (same schema as
        decompress()); results are BITWISE identical to sequential
        decompress() calls (same executables, same inputs — only the
        pull batching differs).  Stall seconds per round are recorded in
        self.gop_times."""
        job = self.start_decompress_gop(ref, streams, sm_fea, feature)
        while not job.step():
            pass
        self.gop_times = job.times
        return job.result

    def start_decompress_gop(self, ref, streams, sm_fea, feature=None,
                             light: bool = False) -> "GOPDecodeJob":
        """Resumable GOP decode: drive with job.step() until job.done.

        Passing ``job.step`` as the ``pump`` of a concurrent
        compress_pipelined() interleaves this GOP's host rounds between
        the next GOP's encode dispatch groups, so each relay pull waits
        on queued useful work instead of idling the device (the r3
        gop_pipeline decoded only AFTER the whole next GOP was encoded,
        leaving 0.14 s/frame of naked stall).

        ``light=True``: per-frame results carry only ``recon`` (plus the
        final frame's ``feature``).  The recurrent 64-ch feature is
        267 MB/frame/stream at 1080p bf16; holding one per decoded frame
        across a GOP window is what OOMed every batch_streams=2 schedule
        in r3 (results/bench_r3_b2.err).  The decode computes exactly the
        same tensors either way — light only drops the references so XLA
        can recycle the buffers."""
        return GOPDecodeJob(self, ref, streams, sm_fea, feature, light=light)


class GOPDecodeJob:
    """In-flight GOP decode: all frames' entropy chains ride one pull per
    round; conditional MC/recon tails run in frame order once the chains
    finish (same executables and inputs as per-frame decode — bitwise
    identical results)."""

    def __init__(self, rt: PFrameRuntime, ref, streams, sm_fea, feature,
                 light: bool = False):
        self.rt = rt
        self.ref = ref
        self.sm_fea = sm_fea
        self.feature = feature
        self.light = light
        self.times = []
        self.done = False
        self.result = None
        batch = int(ref.shape[0])
        defer = lambda means, prev, mu, syms, cond: {
            "means": means, "prev": prev, "mu": mu, "syms": syms
        }
        self.jobs = [
            (rt.mv_rt.start_decompress(mv_bs, batch=batch, finish_fn=defer),
             rt.res_rt.start_decompress(res_bs, batch=batch, finish_fn=defer))
            for mv_bs, res_bs in streams
        ]

    def step(self) -> bool:
        """One interleaved host round across every live chain; on the
        final round, dispatch the per-frame MC/recon tails (async).
        Returns self.done."""
        import time as _time

        import numpy as np

        if self.done:
            return True
        live = [j for fr in self.jobs for j in fr if not j.done]
        if live:
            t0 = _time.perf_counter()
            buf = np.asarray(_concat_flat_n(*[j._idx for j in live]))
            pull_t = _time.perf_counter() - t0
            self.times.append(pull_t)
            off = 0
            for j in live:
                n = int(np.prod(j._idx.shape))
                j.consume(buf[off:off + n], pull_t if off == 0 else 0.0)
                off += n
            if any(not j.done for fr in self.jobs for j in fr):
                return False
        # conditional tails, frame order (async device dispatches only)
        rt, v = self.rt, self.rt.variables
        ref, feature = self.ref, self.feature
        results = []
        for mv_job, res_job in self.jobs:
            m = mv_job.result
            mc = rt._mv_finish_mc(
                v, m["means"], m["prev"], m["mu"], m["syms"], ref,
                self.sm_fea, feature,
            )["mc"]
            r = res_job.result
            fin = rt._res_finish_recon(
                v, r["means"], r["prev"], r["mu"], r["syms"], ref,
                mc["predict_fea"], mc["warp_fea"],
            )
            if self.light:
                results.append({"recon": fin["recon"]})
            else:
                results.append({
                    "feature": fin["feature"],
                    "recon": fin["recon"],
                    "warped": jax.numpy.clip(mc["warped"], 0.0, 1.0),
                    "predict_frame": jax.numpy.clip(mc["predict_frame"], 0.0, 1.0),
                })
            ref, feature = fin["recon"], fin["feature"]
        if self.light:
            results[-1]["feature"] = feature
        self.jobs = None  # release chain intermediates
        self.result = results
        self.done = True
        return True


class PFrameDecodeJob:
    """One in-flight P-frame decode (interleaved MV/residual channel-AR
    chains + MC + recon), advanced one host round per step()."""

    def __init__(self, rt: PFrameRuntime, ref, mv_bs, res_bs, sm_fea, feature):
        self.rt = rt
        self.ref = ref
        self.sm_fea = sm_fea
        self.feature = feature
        v = rt.variables
        batch = int(ref.shape[0])
        # tail dispatches fused with the follow-on stages: MV tail ->
        # +MC; residual tail -> +reconstruction (reads self.mc, which the
        # MV tail has produced by then — the MV job advances first)
        self.mv_job = rt.mv_rt.start_decompress(
            mv_bs, batch=batch,
            finish_fn=lambda means, prev, mu, syms, cond: rt._mv_finish_mc(
                v, means, prev, mu, syms, self.ref, self.sm_fea, self.feature
            ),
        )
        self.res_job = rt.res_rt.start_decompress(
            res_bs, batch=batch,
            finish_fn=lambda means, prev, mu, syms, cond: rt._res_finish_recon(
                v, means, prev, mu, syms, self.ref,
                self.mc["predict_fea"], self.mc["warp_fea"],
            ),
        )
        self.mc = None
        self.done = False
        self.result = None

    def step(self) -> bool:
        """One interleaved host round; returns self.done.

        The MV and residual chains advance in lockstep (same
        max_support_slices), so their per-round index tensors are
        concatenated on device and pulled in ONE transfer — through a
        relay every separate pull pays full sync latency.  The decode
        executables are untouched (concat is lossless), preserving
        encoder/decoder bit-exactness."""
        import time as _time

        import jax.numpy as jnp
        import numpy as np

        if self.done:
            return True
        a = None if self.mv_job.done else self.mv_job._idx
        b = None if self.res_job.done else self.res_job._idx
        t0 = _time.perf_counter()
        if a is not None and b is not None:
            na = int(np.prod(a.shape))
            both = np.asarray(_concat_flat(a, b))
            pull_t = _time.perf_counter() - t0
            self.mv_job.consume(both[:na], pull_t)
            if self.mv_job.done:
                self.mc = self.mv_job.result["mc"]
            self.res_job.consume(both[na:], 0.0)
        elif a is not None:
            self.mv_job.consume(np.asarray(a), _time.perf_counter() - t0)
            if self.mv_job.done:
                self.mc = self.mv_job.result["mc"]
        elif b is not None:
            self.res_job.consume(np.asarray(b), _time.perf_counter() - t0)
        if self.mv_job.done and self.res_job.done:
            fin = self.res_job.result
            self.result = {
                "feature": fin["feature"],
                "recon": fin["recon"],
                "warped": jnp.clip(self.mc["warped"], 0.0, 1.0),
                "predict_frame": jnp.clip(self.mc["predict_frame"], 0.0, 1.0),
            }
            self.done = True
        return self.done
