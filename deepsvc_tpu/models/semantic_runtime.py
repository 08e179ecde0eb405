"""Semantic-layer real-bitstream runtime.

Mirrors the reference's ``OursResNetStudentP.forward(encode=True)`` path
(/root/reference/semantic_layer.py:1053-1094): the stage-1 feature codec
runs real rANS compress/decompress conditioned on the last support
feature, then support aggregation + ResNet stages produce the detection
features.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from .codec_runtime import Bitstream, CodecRuntime
from .semantic import SemanticFeatureCodec, StudentBackbone


class SemanticRuntime:
    def __init__(self, module: StudentBackbone, variables):
        self.module = module
        self.variables = variables
        codec_def = SemanticFeatureCodec(N=module.N, dtype=module.dtype)
        self.codec_rt = CodecRuntime(
            codec_def, {"params": variables["params"]["layer1"]}
        )
        mt = type(module)
        self._post = jax.jit(
            lambda v, x_hat, supp: module.apply(v, x_hat, supp, method=mt.post_decode)
        )
        # wall-clock timers matching the reference's enct/dect/TSFt
        self.enc_time = 0.0
        self.dec_time = 0.0
        self.tsf_time = 0.0

    def update(self, force: bool = True):
        self.codec_rt.update(force)

    def encode_decode(self, x_norm, supp):
        """Real coding round trip; returns (outs, fea, bitstream).

        x_norm: Process-normalized image (B, H, W, 3); supp (S, B, H/4,
        W/4, 256).  The decoded feature is bit-exact between encoder and
        decoder by construction (same jitted stages, same device).
        """
        t0 = time.perf_counter()
        bs = self.codec_rt.compress(x_norm, cond=supp[-1])
        jax.block_until_ready(self.codec_rt._last_encode["y_packed"])
        self.enc_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        dec = self.codec_rt.decompress(bs, cond=supp[-1])
        jax.block_until_ready(dec["x_hat"])
        self.dec_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        outs, fea = self._post(self.variables, dec["x_hat"], supp)
        jax.block_until_ready(fea)
        self.tsf_time = time.perf_counter() - t0
        return outs, fea, bs
