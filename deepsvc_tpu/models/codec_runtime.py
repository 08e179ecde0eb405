"""Bitstream runtime: glue between jitted codec stages and the host coder.

The reference interleaves net evaluation with per-slice GPU->CPU
``.tolist()`` syncs inside compress/decompress
(/root/reference/image_model.py:201-302).  Here the device work is
batched into a handful of jitted stages and the host rANS coder consumes
dense int32 arrays:

  compress:   1 jitted call  -> (z_sym, y_sym, y_idx) -> host encodes all
  decompress: 1 + num_slices jitted calls around the streaming decoder
              (the channel-AR chain is serially dependent on decoded
              bytes — this is the codec's intrinsic latency floor).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..coder import BufferedRansEncoder, RansDecoder, decode_with_indexes, encode_with_indexes
from ..entropy import build_bottleneck_tables, build_gaussian_tables
from ..entropy.cdf import CdfTable


# Tiny shared quantizer programs: round-to-mu symbols for one slice /
# the stacked tail.  Module-free so one callable serves every codec;
# slicing happens INSIDE the programs (an eager y[..., a:b] would be an
# extra relay dispatch per slice).
@functools.partial(jax.jit, static_argnums=(2,))
def _quant_head(y, mu, i):
    d = mu.shape[-1]
    y_slice = jax.lax.slice_in_dim(y, i * d, (i + 1) * d, axis=-1)
    return jnp.round(y_slice.astype(jnp.float32) - mu).astype(jnp.int16)


@functools.partial(jax.jit, static_argnums=(2,))
def _quant_tail(y, mu_tail, ms):
    """mu_tail: (n_tail, B, H, W, d) slice-major; y channels are
    slice-major contiguous, so the reshape/transpose matches."""
    n_tail, d = mu_tail.shape[0], mu_tail.shape[-1]
    yt = jax.lax.slice_in_dim(y, ms * d, (ms + n_tail) * d, axis=-1)
    b, h, w = yt.shape[:3]
    yt = yt.reshape(b, h, w, n_tail, d).transpose(3, 0, 1, 2, 4)
    return jnp.round(yt.astype(jnp.float32) - mu_tail).astype(jnp.int16)


# N-ary flat concat: ONE device->host pull serves every live stream's
# per-round index tensor (decompress_many / pframe decompress_gop);
# retraces once per live-stream count
_concat_flat_n = jax.jit(
    lambda *xs: jnp.concatenate([x.reshape(-1) for x in xs])
)


@jax.jit
def _pack_all(syms, sym_tail, idxs, idx_tail):
    """One packed [sym int8 | idx u8 | overflow-count u32] buffer,
    slice-major stream order (same layout the fused encode_tpu emits;
    see finish_compress), plus the flat int16 symbols for the rare
    overflow fallback."""
    y_sym = jnp.concatenate([jnp.stack(syms), sym_tail], axis=0)
    idx_flat = jnp.concatenate(
        [i.reshape(-1) for i in idxs] + [idx_tail.reshape(-1)]
    )
    y_flat = y_sym.reshape(-1)
    y8 = jnp.clip(y_flat, -128, 127).astype(jnp.int8)
    ovf = (y8.astype(jnp.int16) != y_flat).sum().astype(jnp.int32)
    packed = jnp.concatenate([
        jax.lax.bitcast_convert_type(y8, jnp.uint8),
        idx_flat,
        jax.lax.bitcast_convert_type(ovf[None], jnp.uint8).reshape(-1),
    ])
    return packed, y_flat


@dataclass
class Bitstream:
    """One coded latent: a y stream (all slices) + a z (hyper) stream."""

    y_string: bytes
    z_string: bytes
    z_shape: tuple  # (h, w, C) of the hyper latent
    y_shape: tuple  # (H, W) of the main latent

    @property
    def num_bytes(self) -> int:
        return len(self.y_string) + len(self.z_string)

    def tobytes(self) -> bytes:
        """Length-prefixed container (z_shape/y_shape are coder metadata)."""
        import struct

        head = struct.pack(
            "<IIHHHHH",
            len(self.y_string),
            len(self.z_string),
            self.z_shape[0],
            self.z_shape[1],
            self.z_shape[2],
            self.y_shape[0],
            self.y_shape[1],
        )
        return head + self.y_string + self.z_string

    @classmethod
    def frombytes(cls, data: bytes) -> "Bitstream":
        import struct

        ny, nz, zh, zw, zc, yh, yw = struct.unpack("<IIHHHHH", data[:18])
        y = data[18 : 18 + ny]
        z = data[18 + ny : 18 + ny + nz]
        return cls(y_string=y, z_string=z, z_shape=(zh, zw, zc), y_shape=(yh, yw))


def _find_bottleneck_params(params: dict) -> dict:
    """Locate the entropy_bottleneck param subtree (possibly nested)."""
    if "entropy_bottleneck" in params:
        return params["entropy_bottleneck"]
    for v in params.values():
        if isinstance(v, dict):
            try:
                return _find_bottleneck_params(v)
            except KeyError:
                continue
    raise KeyError("entropy_bottleneck params not found")


class CodecRuntime:
    """Wraps a ChannelARBase module + trained variables for real coding."""

    def __init__(self, module, variables, encoder_xhat: bool = True):
        # DEEPSVC_PALLAS=1 opts the forward-only bitstream path into the
        # pallas conv kernel (see pframe_runtime.PFrameRuntime.__init__)
        import os

        if os.environ.get("DEEPSVC_PALLAS"):
            from ..ops import pallas_conv

            pallas_conv.enable()
        self.module = module
        self.variables = variables
        self.encoder_xhat = encoder_xhat
        self.y_table: CdfTable | None = None
        self.z_table: CdfTable | None = None

        mt = type(module)
        self._encode = jax.jit(
            lambda v, x, cond: module.apply(
                v, x, cond, encoder_xhat, method=mt.encode_tpu
            )
        )
        self._decode_hyper = jax.jit(
            lambda v, z_sym, y_shape, cond: module.apply(
                v, z_sym, y_shape, cond, method=mt.decode_hyper
            ),
            static_argnums=(2,),
        )
        self._decode_params = jax.jit(
            lambda v, m, s, cond: module.apply(v, m, s, cond, method=mt.decode_params)
        )
        self._decode_step = jax.jit(
            lambda v, m, s, prev, mu, sym, cond, i: module.apply(
                v, m, s, prev, mu, sym, i, cond, method=mt.decode_step
            ),
            static_argnums=(7,),
        )
        self._decode_finish = jax.jit(
            lambda v, m, prev, mu, syms, cond: module.apply(
                v, m, prev, mu, syms, cond, method=mt.decode_finish
            )
        )
        self._decode_tail_latent = jax.jit(
            lambda v, m, prev, mu, syms, cond: module.apply(
                v, m, prev, mu, syms, cond, method=mt.decode_tail_latent
            )
        )
        self._synthesize = jax.jit(
            lambda v, y_hat, cond: module.apply(v, y_hat, cond, method=mt.synthesize)
        )
        self._encode_analysis = jax.jit(
            lambda v, x, cond: module.apply(v, x, cond, method=mt.encode_analysis)
        )
        self.update()

    # -- the reference's `update()`: (re)build integer CDF tables --------
    def update(self, force: bool = True):
        eb = _find_bottleneck_params(self.variables["params"])
        self.z_table = build_bottleneck_tables({k: np.asarray(v) for k, v in eb.items()})
        if self.y_table is None or force:
            self.y_table = build_gaussian_tables()

    # --------------------------------------------------------------------

    def compress(self, x, cond=None) -> Bitstream:
        return self.finish_compress(self.start_compress(x, cond))

    def start_compress(self, x, cond=None):
        """Dispatch the device encode (async); finish_compress() later.

        Bit-exact by construction: the encoder-only analysis (g_a/h_a +
        hyper quantization) runs as its own program, then everything the
        DECODER recomputes (hyper synthesis, per-slice entropy params,
        slice reconstruction, synthesis) is produced by driving the
        decoder's own jitted executables with the same inputs the decoder
        will see.  Identical executables + identical inputs => identical
        outputs, so symbols/indexes/reconstructions match the decoder
        bitwise with NO cross-program float-determinism assumption (TPU
        convs are not bitwise-reproducible across fusion contexts; the
        old fused encode_tpu path is kept as start_compress_fused for
        A/B).  All dispatches are async — no host sync until
        finish_compress pulls the packed symbol buffer.
        """
        a = self._encode_analysis(self.variables, x, cond)
        return self.drive_exact(a, cond,
                                with_finish=self.encoder_xhat)

    def drive_exact(self, analysis, cond=None, finish_fn=None,
                    with_finish=True, pump=None):
        """Run the decoder's executables over known y to produce the
        encode outputs (see start_compress).  ``finish_fn`` fuses caller
        stages into the tail dispatch exactly like _DecodeJob's; with
        neither, the tail reconstruction/synthesis is skipped entirely
        (symbols and indexes do not depend on it).

        ``pump``: optional callable invoked between dispatch groups.  TPU
        programs execute in dispatch order, so an in-flight decode job
        whose rounds are driven only AFTER the whole encode is queued
        stalls every round behind the full encode (the r2/r3-mid bench:
        pipelined fps == serial fps).  A pump hook lets the caller advance
        that job's host rounds *between* encode dispatches — its small
        device steps interleave into the queue and each pull waits only
        for work queued so far.  Pumping changes dispatch ORDER only,
        never any program or its inputs, so bit-exactness is unaffected."""
        v = self.variables
        z_sym, y = analysis["z_sym"], analysis["y"]
        y_shape = (int(y.shape[1]), int(y.shape[2]))
        ms = self.module.max_support_slices

        means, scales = self._decode_hyper(v, z_sym, y_shape, cond)
        mu, idx = self._decode_params(v, means, scales, cond)
        if pump is not None:
            pump()
        y_hat_prev = None
        syms, idxs = [], []
        for i in range(1, ms + 1):
            sym = _quant_head(y, mu, i - 1)
            syms.append(sym)
            idxs.append(idx)
            y_hat_prev, mu, idx = self._decode_step(
                v, means, scales, y_hat_prev, mu, sym, cond, i
            )
            if pump is not None:
                pump()
        # tail: mu is (n_tail, B, H, W, d) stacked slice-major, idx is the
        # concatenated tail indexes (decode_step's i==ms output)
        sym_tail = _quant_tail(y, mu, ms)
        packed, y_sym_flat = _pack_all(syms, sym_tail, idxs, idx)
        out = {
            "z_sym": z_sym,
            "y_packed": packed,
            "y_sym": y_sym_flat,
            "y_shape": y_shape,
        }
        if finish_fn is not None:
            out["fin"] = finish_fn(means, y_hat_prev, mu, sym_tail, cond)
        elif with_finish:
            out["fin"] = self._decode_finish(
                v, means, y_hat_prev, mu, sym_tail, cond
            )
        else:
            # no tail reconstruction requested, but the encoder-side
            # latent is still part of the handle contract
            # (_last_encode["y_hat"], tests/test_pframe.py bit-exactness)
            out["y_hat"] = self._decode_tail_latent(
                v, means, y_hat_prev, mu, sym_tail, cond
            )
        if out.get("fin") is not None:
            out["y_hat"] = out["fin"].get("y_hat")
            if "x_hat" in out["fin"]:
                out["x_hat"] = out["fin"]["x_hat"]
        return out

    def start_compress_fused(self, x, cond=None):
        """The one-dispatch fused encoder (encode_tpu).  Fastest single
        program, but its entropy parameters come from a DIFFERENT XLA
        program than the decoder's — bit-exactness then rests on
        cross-program float determinism, which does not hold for TPU
        conv fusions.  Kept for A/B measurement only."""
        return self._encode(self.variables, x, cond)

    def finish_compress(self, out) -> Bitstream:
        import time as _time

        t0 = _time.perf_counter()
        # two overlapped pulls: tiny z_sym + the packed y buffer
        # ([y_sym int8 | y_idx u8 | ovf u32], one transfer instead of 3)
        out["z_sym"].copy_to_host_async()
        out["y_packed"].copy_to_host_async()
        z_sym = np.asarray(out["z_sym"])
        buf = np.asarray(out["y_packed"])
        n = (buf.size - 4) // 2
        y_idx = buf[n : 2 * n]
        if int(buf[2 * n :].view(np.int32)[0]) == 0:
            y_sym = buf[:n].view(np.int8).astype(np.int16)
        else:  # rare: some |symbol| > 127 — pull the exact int16 tensor
            y_sym = np.asarray(out["y_sym"])
        t1 = _time.perf_counter()

        # hyper latent: one CDF row per channel
        zc = z_sym.shape[-1]
        z_rows = np.broadcast_to(np.arange(zc, dtype=np.int32), z_sym.shape)
        z_string = encode_with_indexes(z_sym, z_rows, self.z_table)

        enc = BufferedRansEncoder()
        enc.encode_with_indexes(y_sym, y_idx, self.y_table)
        y_string = enc.flush()
        self.timings = {
            "enc_device+d2h": t1 - t0,
            "enc_host_rans": _time.perf_counter() - t1,
        }

        self._last_encode = out  # encoder-side reconstructions, reusable
        # True y spatial dims from static shape metadata — NOT derived as
        # z*4, which silently corrupts every decode when input padding
        # makes y indivisible by 4 (ADVICE r2 #1).  decode_hyper crops
        # its upsampled params to this shape, so any y <= z*4 decodes
        # correctly.
        if "y_shape" in out:
            y_h, y_w = out["y_shape"]
        else:
            y_h, y_w = int(out["y_hat"].shape[1]), int(out["y_hat"].shape[2])
        z_h, z_w = int(z_sym.shape[1]), int(z_sym.shape[2])
        if not (z_h * 4 >= y_h > (z_h - 1) * 4 and z_w * 4 >= y_w > (z_w - 1) * 4):
            raise ValueError(
                f"hyper/latent shape mismatch: y {(y_h, y_w)} vs z {(z_h, z_w)}"
            )
        return Bitstream(
            y_string=y_string,
            z_string=z_string,
            z_shape=tuple(z_sym.shape[1:]),
            y_shape=(y_h, y_w),
        )

    def start_decompress(self, bs: Bitstream, cond=None, batch: int = 1,
                         finish_fn=None) -> "_DecodeJob":
        """Begin a resumable decode: host z decode + async hyper/params
        dispatch happen here; drive with job.advance() until job.done.

        Two independent jobs can be interleaved so one stream's host rANS
        overlaps the other's queued device step (the P-frame MV/residual
        pair, pframe_runtime.decompress).

        ``finish_fn(means, y_hat_prev, mu_tail, syms_tail, cond)`` replaces
        the default decode_finish dispatch for the tail round — callers
        fuse follow-on device stages (MC, reconstruction) into that single
        dispatch instead of issuing them separately."""
        return _DecodeJob(self, bs, cond, batch, finish_fn)

    def decompress(self, bs: Bitstream, cond=None, batch: int = 1):
        """Minimum-round-trip decode: max_support_slices + 1 host syncs.

        Per sync: one uint8 index tensor D->H, one int16 symbol tensor
        H->D; all f32 state (mu, decoded slices) stays on device between
        the fused jitted steps.
        """
        job = self.start_decompress(bs, cond, batch)
        while not job.done:
            job.advance()
        self.timings = {**getattr(self, "timings", {}), "dec_steps": job.times}
        return job.result

    def decompress_many(self, streams: list, cond=None, batch: int = 1):
        """Decode several independent bitstreams (e.g. the I-frames of
        many serving streams) with their channel-AR chains INTERLEAVED:
        every live job's per-round index tensor is concatenated on
        device and pulled in ONE transfer, so the fixed host-sync
        latency amortizes over the streams instead of costing
        (max_support_slices+1) round trips each.  Results are BITWISE
        identical to per-stream decompress() (same executables, same
        inputs — only the pull batching differs).  The reference
        decodes strictly one stream at a time
        (/root/reference/image_model.py:259-302)."""
        import time as _time

        jobs = [self.start_decompress(bs, cond, batch) for bs in streams]
        self.many_times = []
        while True:
            live = [j for j in jobs if not j.done]
            if not live:
                break
            t0 = _time.perf_counter()
            buf = np.asarray(_concat_flat_n(*[j._idx for j in live]))
            pull_t = _time.perf_counter() - t0
            self.many_times.append(pull_t)
            off = 0
            for j in live:
                n = int(np.prod(j._idx.shape))
                j.consume(buf[off:off + n], pull_t if off == 0 else 0.0)
                off += n
        return [j.result for j in jobs]


class _DecodeJob:
    """One in-flight channel-AR decode, advanced one host-blocking round
    at a time (max_support_slices rounds + 1 tail round)."""

    def __init__(self, rt: CodecRuntime, bs: Bitstream, cond, batch: int,
                 finish_fn=None):
        self.rt = rt
        self.bs = bs
        self.cond = cond
        self.batch = batch
        self.finish_fn = finish_fn
        self.done = False
        self.result = None
        self.times = []

        z_shape = (batch,) + tuple(bs.z_shape)
        zc = z_shape[-1]
        z_rows = np.broadcast_to(np.arange(zc, dtype=np.int32), z_shape)
        # host rANS for the hyper latent (blocking host CPU only)
        z_sym = (
            decode_with_indexes(bs.z_string, z_rows, rt.z_table)
            .reshape(z_shape)
            .astype(np.int16)
        )
        # async device dispatches: hyper synthesis + slice-0 params
        self._latents = rt._decode_hyper(
            rt.variables, jnp.asarray(z_sym), tuple(bs.y_shape), cond
        )
        means, scales = self._latents
        self._mu, self._idx = rt._decode_params(rt.variables, means, scales, cond)
        self._y_hat_prev = None
        self._i = 1

        self._dec = RansDecoder()
        self._dec.set_stream(bs.y_string)

    def prefetch(self):
        """Start the idx device->host transfer without blocking.

        Call on BOTH interleaved jobs before advancing either so the two
        relay round trips overlap instead of serializing."""
        if not self.done:
            self._idx.copy_to_host_async()

    def advance(self) -> bool:
        """One host round: pull idx (blocks on the queued device step),
        host rANS, push symbols + dispatch the next device step (async).
        Returns self.done."""
        import time as _time

        if self.done:
            return True
        t0 = _time.perf_counter()
        idx_h = np.asarray(self._idx)
        return self.consume(idx_h, _time.perf_counter() - t0)

    def consume(self, idx_h, pull_t: float = 0.0) -> bool:
        """Advance one round given the already-pulled host indexes.

        Callers coordinating several jobs (PFrameDecodeJob) concatenate
        the jobs' idx tensors on device and make ONE host pull per round
        — through a relay every separate transfer pays full sync latency
        — then feed each job its slice here.  The device executables are
        unchanged (concat is lossless), so encoder/decoder bit-exactness
        is unaffected."""
        import time as _time

        if self.done:
            return True
        rt, cond, batch = self.rt, self.cond, self.batch
        H, W = self.bs.y_shape
        means, scales = self._latents
        ms = rt.module.max_support_slices

        t1 = _time.perf_counter()
        sym = self._dec.decode_stream(np.ascontiguousarray(idx_h), rt.y_table)
        t2 = _time.perf_counter()
        t0 = t1 - pull_t

        if self._i <= ms:
            sym = jnp.asarray(sym.astype(np.int16).reshape(batch, H, W, -1))
            self._y_hat_prev, self._mu, self._idx = rt._decode_step(
                rt.variables, means, scales, self._y_hat_prev, self._mu, sym,
                cond, self._i,
            )
            self._i += 1
        else:
            d = rt.module.slice_depth
            n_tail = rt.module.num_slices - ms
            sym_tail = jnp.asarray(
                sym.astype(np.int16).reshape(n_tail, batch, H, W, d)
            )
            if self.finish_fn is not None:
                self.result = self.finish_fn(
                    means, self._y_hat_prev, self._mu, sym_tail, cond
                )
            else:
                self.result = rt._decode_finish(
                    rt.variables, means, self._y_hat_prev, self._mu, sym_tail,
                    cond,
                )
            self.done = True
        self.times.append((t1 - t0, t2 - t1, _time.perf_counter() - t2))
        return self.done
