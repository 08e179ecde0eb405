"""Channel-autoregressive hyperprior codecs (NHWC, flax).

TPU-native redesign of the reference's two latent codecs:

- :class:`ImageCodec` — the I-frame codec ("ICIP2020ResB",
  /root/reference/image_model.py:331-619): N=192 hyper channels, M=320
  latent channels, 10 slices / 5 support slices.
- :class:`ConditionalCodec` — the conditional latent codec
  ("ChannelSplitICIP2020ResB", image_model.py:41-328) used for motion
  vectors (in 8ch, N=64, out 2) and feature-space residuals (in 70ch,
  N=96, out 64): 8 slices / 4 support.

TPU-first design decisions (vs. the reference's CUDA/torch structure):

- The *encode* path is a single jitted function: the channel-AR chain is
  unrolled on device (encode knows y, so every slice's mu/sigma/symbols
  are computed without host round-trips) and emits dense int32
  symbol/index tensors — ONE device->host transfer per latent, instead of
  the reference's per-slice ``.tolist()`` syncs (image_model.py:241-242).
- The *decode* path is latency-bound by construction (symbols for slice i
  depend on decoded bytes of slices < i); it runs as `num_slices` small
  jitted stages around the streaming host rANS decoder.
- Hyper-synthesis outputs are cropped to the y-shape once, right after
  synthesis, rather than per-slice (reference: image_model.py:175).
- Entropy math stays f32; transforms may run bf16.
- Encoder/decoder bit-exactness is STRUCTURAL, not assumed: the encoder
  computes entropy parameters and reconstructions by driving the
  decoder's own jitted executables over known y
  (encode_analysis + codec_runtime.drive_exact).  TPU convs are not
  bitwise-reproducible across different fusion contexts, so any design
  that evaluates h_mean_s/h_scale_s/cc_* in one fused program at encode
  and per-round programs at decode (the old encode_tpu path, kept for
  A/B) desyncs the rANS stream when a last-bit scale difference flips a
  CDF row index (measured: full-frame corruption at 1080p bf16).
- The entropy-PARAMETER networks still run f32 regardless of the model
  dtype — for parameter *quality* (mu/sigma precision directly sets the
  rate), not for determinism.  They run at the latent's /16 spatial
  resolution, so the f32 cost is a few ms/frame.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy.bottleneck import EntropyBottleneck
from ..entropy.gaussian import GaussianConditional, build_indexes
from ..entropy.ops import ste_round
from .layers import Conv, Deconv, ResBottleneckBlock, SubpelConv, leaky_relu

Dtype = Any


class ConvStack(nn.Module):
    """Sequence of convs with an activation between (not after) them.

    spec: list of (features, kernel, stride, mode) where mode is
    "conv" | "deconv" | "subpel".
    """

    spec: Sequence[tuple]
    act: str = "leaky_relu"  # "leaky_relu" | "gelu" | "relu"
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        n = len(self.spec)
        for i, (feat, k, s, mode) in enumerate(self.spec):
            if mode == "conv":
                x = Conv(feat, k, s, dtype=self.dtype, packed=self.packed)(x)
            elif mode == "deconv":
                x = Deconv(feat, k, s, dtype=self.dtype)(x)
            elif mode == "subpel":
                x = SubpelConv(feat, s, k, dtype=self.dtype)(x)
            else:
                raise ValueError(mode)
            if i < n - 1:
                if self.act == "gelu":
                    x = nn.gelu(x, approximate=False)
                elif self.act == "relu":
                    x = nn.relu(x)
                else:
                    x = leaky_relu(x, 0.01)
        return x


class AnalysisTransform(nn.Module):
    """g_a: 4x (stride-2 conv5 + 3 ResBottleneck), final conv to M
    (image_model.py:52-66, 343-357)."""

    N: int
    M: int
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        pk = self.packed
        for _ in range(3):
            x = Conv(self.N, 5, 2, dtype=self.dtype, packed=pk)(x)
            for _ in range(3):
                x = ResBottleneckBlock(self.N, dtype=self.dtype, packed=pk)(x)
        return Conv(self.M, 5, 2, dtype=self.dtype, packed=pk)(x)


class SynthesisTransform(nn.Module):
    """g_s: mirror of g_a with transpose convs (image_model.py:68-82)."""

    N: int
    out_ch: int
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        pk = self.packed
        for _ in range(3):
            x = Deconv(self.N, 5, 2, dtype=self.dtype)(x)
            for _ in range(3):
                x = ResBottleneckBlock(self.N, dtype=self.dtype, packed=pk)(x)
        return Deconv(self.out_ch, 5, 2, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Channel-AR slice machinery shared by every codec in the family
# ---------------------------------------------------------------------------


class ChannelARBase(nn.Module):
    """Shared slice-conditional entropy machinery.

    Subclasses create in setup(): g_a, g_s, h_a, h_mean_s, h_scale_s,
    cc_mean, cc_scale, cc_lrp (lists), entropy_bottleneck; and define
    num_slices / max_support_slices / latent channels M.

    The optional ``cond`` argument is the RAW conditioning object (e.g.
    the previous decoded semantic feature).  Three overridable hooks give
    conditional subclasses full control (semantic_layer.py:1324-1378
    semantics):

      _encoder_input(x, cond)  -> g_a input          (default: x)
      _slice_cond(cond)        -> per-slice support  (default: None)
      _synthesis(y_hat, cond)  -> x_hat              (default: g_s)
    """

    def _encoder_input(self, x_in, cond):
        return x_in

    def _slice_cond(self, cond):
        return None

    def _synthesis(self, y_hat, cond):
        return self.g_s(y_hat)

    def _hyper(self, y):
        """z, and (means, scales) synthesis from the STE-rounded z."""
        z = self.h_a(y.astype(jnp.float32))
        return z

    def _latents_from_zhat(self, z_hat, y_shape):
        scales = self.h_scale_s(z_hat)[:, : y_shape[0], : y_shape[1], :]
        means = self.h_mean_s(z_hat)[:, : y_shape[0], : y_shape[1], :]
        return means.astype(jnp.float32), scales.astype(jnp.float32)

    def _slice_support(self, base, cond, y_hat_slices):
        parts = [base]
        if cond is not None:
            parts.append(cond)
        parts.extend(y_hat_slices[: self.max_support_slices])
        return jnp.concatenate(parts, axis=-1)

    def _split(self, y):
        d = y.shape[-1] // self.num_slices
        return [y[..., i * d : (i + 1) * d] for i in range(self.num_slices)]

    def forward(self, x_in, cond=None, *, rng=None, training=True):
        """Training/eval forward: returns x_hat, likelihoods, y."""
        y = self.g_a(self._encoder_input(x_in, cond))
        y_shape = y.shape[1:3]
        z = self._hyper(y)
        slice_cond = self._slice_cond(cond)

        if training:
            rng_z, rng_y = jax.random.split(rng)
        else:
            rng_z = rng_y = None
        _, z_lik = self.entropy_bottleneck(z, rng=rng_z, training=training)
        z_hat = self.entropy_bottleneck.quantize_ste(z)
        latent_means, latent_scales = self._latents_from_zhat(z_hat, y_shape)

        gc = GaussianConditional()
        y_slices = self._split(y.astype(jnp.float32))
        y_hat_slices = []
        y_liks = []
        for i, y_slice in enumerate(y_slices):
            mean_support = self._slice_support(latent_means, slice_cond, y_hat_slices)
            scale_support = self._slice_support(latent_scales, slice_cond, y_hat_slices)
            mu = self.cc_mean[i](mean_support).astype(jnp.float32)
            scale = self.cc_scale[i](scale_support).astype(jnp.float32)

            if training:
                rng_y, rng_i = jax.random.split(rng_y)
            else:
                rng_i = None
            _, lik = gc(y_slice, scale, mu, rng=rng_i, training=training)
            y_liks.append(lik)
            y_hat_slice = ste_round(y_slice - mu) + mu

            lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
            lrp = self.cc_lrp[i](lrp_support).astype(jnp.float32)
            y_hat_slice = y_hat_slice + 0.5 * jnp.tanh(lrp)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self._synthesis(y_hat, cond)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(y_liks, axis=-1), "z": z_lik},
            "y": y,
        }

    def __call__(self, x_in, cond=None, *, rng=None, training=True):
        return self.forward(x_in, cond, rng=rng, training=training)

    # ----------------------- real-bitstream paths -----------------------

    def encode_analysis(self, x_in, cond=None):
        """Encoder-only analysis: g_a + h_a + hyper quantization.

        Everything downstream (entropy parameters, slice reconstruction,
        synthesis) is computed by driving the DECODER's own jitted
        executables (CodecRuntime.encode_exact), so encoder and decoder
        state are bit-identical by construction — no cross-program float
        determinism assumption (module docstring; the fused encode_tpu
        relies on one).
        """
        y = self.g_a(self._encoder_input(x_in, cond))
        z = self._hyper(y)
        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int16)
        return {"z_sym": z_sym, "y": y.astype(jnp.float32)}

    def encode_tpu(self, x_in, cond=None, with_xhat=True):
        """Whole-encode on device: dense symbols/indexes, one transfer.

        Returns dict of int16/uint8 tensors:
          z_sym (B,h,w,Cz), y_sym / y_idx (num_slices, B, H, W, d),
        plus f32 y_hat (decoder-side latent) and, when ``with_xhat``,
        the decoder-side x_hat (skippable when the caller does not need
        the synthesis, e.g. the residual codec's encoder).
        """
        y = self.g_a(self._encoder_input(x_in, cond))
        y_shape = y.shape[1:3]
        z = self._hyper(y)
        slice_cond = self._slice_cond(cond)

        medians = self.entropy_bottleneck.medians()
        z_sym = jnp.round(z - medians).astype(jnp.int16)
        z_hat = z_sym.astype(jnp.float32) + medians
        latent_means, latent_scales = self._latents_from_zhat(z_hat, y_shape)

        y_slices = self._split(y.astype(jnp.float32))
        y_hat_slices, syms, idxs = [], [], []
        for i, y_slice in enumerate(y_slices):
            mean_support = self._slice_support(latent_means, slice_cond, y_hat_slices)
            scale_support = self._slice_support(latent_scales, slice_cond, y_hat_slices)
            mu = self.cc_mean[i](mean_support).astype(jnp.float32)
            scale = self.cc_scale[i](scale_support).astype(jnp.float32)

            # int16/uint8 keep the device->host transfer small (the relay
            # in dev environments is bandwidth-bound; also right on PCIe)
            sym = jnp.round(y_slice - mu).astype(jnp.int16)
            idx = build_indexes(scale).astype(jnp.uint8)
            y_hat_slice = sym.astype(jnp.float32) + mu

            lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
            lrp = self.cc_lrp[i](lrp_support).astype(jnp.float32)
            y_hat_slices.append(y_hat_slice + 0.5 * jnp.tanh(lrp))
            syms.append(sym)
            idxs.append(idx)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        y_sym = jnp.stack(syms)
        # One device->host pull: [y_sym int8 | y_idx u8 | overflow u32].
        # The relay pays ~20-35ms latency PER transfer, so everything
        # rides one flat u8 buffer (self-describing: n = (len-4)/2);
        # int8 also halves the symbol bytes.  Out-of-int8 symbols are
        # vanishingly rare — the count makes the host pull the int16
        # tensor only in that case.
        y_sym8 = jnp.clip(y_sym, -128, 127).astype(jnp.int8)
        y_ovf = (y_sym8.astype(jnp.int16) != y_sym).sum().astype(jnp.int32)
        packed = jnp.concatenate([
            jax.lax.bitcast_convert_type(y_sym8.reshape(-1), jnp.uint8),
            jnp.stack(idxs).reshape(-1),
            jax.lax.bitcast_convert_type(y_ovf[None], jnp.uint8).reshape(-1),
        ])
        out = {
            "z_sym": z_sym,
            "y_sym": y_sym.reshape(-1),
            "y_packed": packed,
            "y_hat": y_hat,
        }
        if with_xhat:
            out["x_hat"] = self._synthesis(y_hat, cond)
        return out

    def decode_hyper(self, z_sym, y_shape, cond=None):
        """z_hat from decoded z symbols -> cropped (means, scales)."""
        medians = self.entropy_bottleneck.medians()
        z_hat = z_sym.astype(jnp.float32) + medians
        return self._latents_from_zhat(z_hat, tuple(y_shape))

    # Decode is latency-bound (serial channel-AR around the host coder),
    # so round trips are minimized:
    #   - recon of slice i-1 and params of slice i are ONE dispatch
    #   - all tail slices (index >= max_support_slices) share the same
    #     frozen support, so their params/recon are batched: only
    #     max_support_slices + 1 host round trips per latent total.

    def _params_for(self, latent_means, latent_scales, slice_cond, y_hat_slices, i):
        mean_support = self._slice_support(latent_means, slice_cond, y_hat_slices)
        scale_support = self._slice_support(latent_scales, slice_cond, y_hat_slices)
        mu = self.cc_mean[i](mean_support).astype(jnp.float32)
        scale = self.cc_scale[i](scale_support).astype(jnp.float32)
        # idx is pulled to the host every decode round: flatten so the
        # transfer ships no tile padding
        return mu, build_indexes(scale).astype(jnp.uint8).reshape(-1)

    def _recon_slice(self, latent_means, slice_cond, y_hat_slices, mu, sym, i):
        y_hat_slice = sym.astype(jnp.float32) + mu
        mean_support = self._slice_support(latent_means, slice_cond, y_hat_slices)
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        lrp = self.cc_lrp[i](lrp_support).astype(jnp.float32)
        return y_hat_slice + 0.5 * jnp.tanh(lrp)

    def decode_params(self, latent_means, latent_scales, cond=None):
        """Params for slice 0 (decode entry point)."""
        slice_cond = self._slice_cond(cond)
        return self._params_for(latent_means, latent_scales, slice_cond, [], 0)

    def decode_step(self, latent_means, latent_scales, y_hat_prev, mu_prev,
                    sym_prev, slice_index, cond=None):
        """Reconstruct slice ``slice_index - 1`` and emit next params.

        Returns (y_hat_prev', mu_next, idx_next).  When slice_index hits
        max_support_slices, mu_next/idx_next cover ALL remaining slices
        (channel-concatenated, same coding order as the encoder).
        """
        slice_cond = self._slice_cond(cond)
        prev_slices = self._split_prev(y_hat_prev, slice_index - 1)
        y_hat_slice = self._recon_slice(
            latent_means, slice_cond, prev_slices, mu_prev, sym_prev, slice_index - 1
        )
        y_hat_prev = (
            y_hat_slice
            if y_hat_prev is None
            else jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
        )
        slices = prev_slices + [y_hat_slice]

        if slice_index == self.max_support_slices:
            # batched tail: stacked slice-major to match the encoder's
            # stream order (slice ms fully, then ms+1, ...)
            mus, idxs = [], []
            for i in range(slice_index, self.num_slices):
                mu, idx = self._params_for(
                    latent_means, latent_scales, slice_cond, slices, i
                )
                mus.append(mu)
                idxs.append(idx)
            return y_hat_prev, jnp.stack(mus), jnp.concatenate(idxs)
        mu, idx = self._params_for(latent_means, latent_scales, slice_cond, slices,
                                   slice_index)
        return y_hat_prev, mu, idx

    def decode_finish(self, latent_means, y_hat_prev, mu_tail, syms_tail, cond=None):
        """Reconstruct all tail slices and synthesize x_hat.

        syms_tail/mu_tail: (num_tail, B, H, W, d) stacked slice-major;
        support is the frozen first max_support_slices.
        """
        slice_cond = self._slice_cond(cond)
        support = self._split_prev(y_hat_prev, self.max_support_slices)
        parts = [y_hat_prev]
        for k, i in enumerate(range(self.max_support_slices, self.num_slices)):
            parts.append(
                self._recon_slice(
                    latent_means, slice_cond, support, mu_tail[k], syms_tail[k], i
                )
            )
        y_hat = jnp.concatenate(parts, axis=-1)
        return {"x_hat": self._synthesis(y_hat, cond), "y_hat": y_hat}

    def decode_tail_latent(self, latent_means, y_hat_prev, mu_tail, syms_tail,
                           cond=None):
        """decode_finish minus the synthesis: the full y_hat only.

        Encoder bookkeeping path — compress() skips the tail
        reconstruction (the serial protocol takes recon from the decode)
        but the encoder-side latent must still exist for the
        bit-exactness contract checks (_last_encode["y_hat"])."""
        slice_cond = self._slice_cond(cond)
        support = self._split_prev(y_hat_prev, self.max_support_slices)
        parts = [y_hat_prev]
        for k, i in enumerate(range(self.max_support_slices, self.num_slices)):
            parts.append(
                self._recon_slice(
                    latent_means, slice_cond, support, mu_tail[k], syms_tail[k], i
                )
            )
        return jnp.concatenate(parts, axis=-1)

    def synthesize(self, y_hat, cond=None):
        return self._synthesis(y_hat, cond)

    def _split_prev(self, y_hat_prev, slice_index):
        if y_hat_prev is None or slice_index == 0:
            return []
        d = self.slice_depth
        return [y_hat_prev[..., i * d : (i + 1) * d] for i in range(slice_index)]

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


# ---------------------------------------------------------------------------


class ImageCodec(ChannelARBase):
    """I-frame codec — reference "ICIP2020ResB" (image_model.py:331-438).

    Slice shape: the reference's 10 slices / 5 support
    (image_model.py:437-438), paying 6 serial host round trips per
    decode.  The r4 perf redesign had cut support to 2 slices (3 host
    rounds); the r5 A/B (results/slice_ab.json: equal lambda/steps/data)
    measured +24.6% bpp for +0.14 dB for that cut, and the I-codec only
    decodes once per GOP so the latency saving is small amortized —
    reverted to the reference shape in r6.  The revert changes the cc_*
    conditioning weight shapes, so r6 checkpoints are fresh; the 10/2
    profile remains reachable via ImageCodecConfig overrides."""

    N: int = 192
    M: int = 320
    num_slices: int = 10
    max_support_slices: int = 5
    dtype: Dtype = jnp.float32
    packed: bool = True  # transform convs via the exact h2/s2 lowering

    @property
    def slice_depth(self):
        return self.M // self.num_slices

    def setup(self):
        if self.M % self.num_slices:
            raise ValueError("slices must divide latent depth")
        d = self.slice_depth
        N, M, dt = self.N, self.M, self.dtype

        self.g_a = AnalysisTransform(N, M, dtype=dt, packed=self.packed)
        self.g_s = SynthesisTransform(N, 3, dtype=dt, packed=self.packed)
        self.h_a = ConvStack(
            [(N, 3, 1, "conv"), (N, 5, 2, "conv"), (N, 5, 2, "conv")], "leaky_relu", dt
        )
        # f32: encoder/decoder cross-program determinism (module docstring)
        f32 = jnp.float32
        self.h_mean_s = ConvStack(
            [(N, 5, 2, "deconv"), (256, 5, 2, "deconv"), (M, 3, 1, "conv")], "leaky_relu", f32
        )
        self.h_scale_s = ConvStack(
            [(N, 5, 2, "deconv"), (256, 5, 2, "deconv"), (M, 3, 1, "conv")], "leaky_relu", f32
        )
        cc_spec = [(224, 3, 1, "conv"), (128, 3, 1, "conv"), (d, 3, 1, "conv")]
        self.cc_mean = [ConvStack(cc_spec, "leaky_relu", f32) for _ in range(self.num_slices)]
        self.cc_scale = [ConvStack(cc_spec, "leaky_relu", f32) for _ in range(self.num_slices)]
        self.cc_lrp = [ConvStack(cc_spec, "leaky_relu", f32) for _ in range(self.num_slices)]
        self.entropy_bottleneck = EntropyBottleneck(channels=N)


class ConditionalCodec(ChannelARBase):
    """Conditional latent codec — reference "ChannelSplitICIP2020ResB"
    (image_model.py:41-328).  in 8ch/N=64/out 2 for MV; in 70ch/N=96/out
    64 for residual (video_model.py:17-18).

    Slice shape: the reference's 8 slices / 4 support
    (image_model.py:114-146) = 5 serial host rounds per latent decode.
    A live P-frame decode pays that once per frame (MV and residual
    chains interleave into shared pulls), which at ~35-40 ms of relay
    latency per round was 0.21 s/frame of pure stall at 1080p (r3
    bench); the r4 perf redesign therefore ran 4 wider slices / 1
    support (2 host rounds).  After the I-codec A/B showed the same
    style of cut costs +24.6% bpp (results/slice_ab.json), r6 reverted
    the default to the reference shape; the owed P-codec pair
    measurement (4/1 vs 8/4 at equal steps, scripts/slice_ab.py) decides
    whether the 4/1 serving profile keeps a supported override path."""

    in_ch: int = 8
    N: int = 64
    out_ch: int = 2
    num_slices: int = 8
    max_support_slices: int = 4
    dtype: Dtype = jnp.float32
    packed: bool = True  # transform convs via the exact h2/s2 lowering

    @property
    def slice_depth(self):
        return self.N // self.num_slices

    def setup(self):
        if self.N % self.num_slices:
            raise ValueError("slices must divide latent depth")
        d = self.slice_depth
        N, dt = self.N, self.dtype

        self.g_a = AnalysisTransform(N, N, dtype=dt, packed=self.packed)
        self.g_s = SynthesisTransform(N, self.out_ch, dtype=dt, packed=self.packed)
        self.h_a = ConvStack(
            [(N, 3, 1, "conv"), (N, 3, 2, "conv"), (N, 3, 1, "conv"), (N, 3, 2, "conv")],
            "gelu", dt,
        )
        hs_spec = [(N, 3, 2, "subpel"), (N, 3, 1, "conv"), (N, 3, 2, "subpel"), (N, 3, 1, "conv")]
        # f32: encoder/decoder cross-program determinism (module docstring)
        f32 = jnp.float32
        self.h_mean_s = ConvStack(hs_spec, "gelu", f32)
        self.h_scale_s = ConvStack(hs_spec, "gelu", f32)
        cc_spec = [(N, 3, 1, "conv"), (64, 3, 1, "conv"), (32, 3, 1, "conv"), (d, 3, 1, "conv")]
        lrp_spec = [(N, 3, 1, "conv"), (N // 2, 3, 1, "conv"), (d, 3, 1, "conv")]
        self.cc_mean = [ConvStack(cc_spec, "gelu", f32) for _ in range(self.num_slices)]
        self.cc_scale = [ConvStack(cc_spec, "gelu", f32) for _ in range(self.num_slices)]
        self.cc_lrp = [ConvStack(lrp_spec, "gelu", f32) for _ in range(self.num_slices)]
        self.entropy_bottleneck = EntropyBottleneck(channels=N)
