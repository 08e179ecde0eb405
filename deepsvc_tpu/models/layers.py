"""NN building blocks (flax.linen, NHWC).

TPU-first re-design of the reference's block zoo
(/root/reference/modules.py, image_model.py:22-38): parameters are f32,
compute dtype is configurable (bf16 on TPU for the transform paths;
entropy parameters stay f32).

Note on fidelity: the reference calls ``nn.LeakyReLU(True)`` in several
places (e.g. modules.py:422, semantic_layer.py:1204) which in torch sets
negative_slope=1.0 — an identity function (an inplace-flag typo).  We
implement the *intended* LeakyReLU(0.01) and document the deviation here.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import max_pool, pixel_shuffle

Dtype = Any


def leaky_relu(x, slope: float = 0.01):
    return nn.leaky_relu(x, negative_slope=slope)


def _pack_w(x):
    """(B,H,W,C) -> (B,H,W/2,2C) packed view (free reshape)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def _unpack_w(x, features):
    B, H, w2, _ = x.shape
    return x.reshape(B, H, w2 * 2, features)


class Conv(nn.Module):
    """Conv2d with torch-style symmetric padding k//2 (compressai `conv`).

    ``packed=True``: the conv is computed via the EXACT horizontal (1x2)
    channel packing (ops/packed.py conv_h2) — (B,H,W,C) is a free
    reshape away from (B,H,W/2,2C), doubling lane utilization on the
    MXU; measured 1.2-1.9x faster at 1080p for C in {32, 64}.  Input
    and output stay UNPACKED; parameters keep the (k, k, Cin, Cout)
    shape, so the param tree and the computed function are identical
    across the flag.  Falls back to the plain conv when the shape or
    stride does not qualify.

    Checkpoint compatibility: since r2 the kernel/bias are created via
    ``self.param`` directly (one scope level: ``.../Conv_0/kernel``).
    Checkpoints written by the r1 nn.Conv-wrapping revision
    (``.../Conv_0/Conv_0/kernel``) are NOT restorable; this break is
    deliberate — no r1 checkpoint ever completed training, so no
    migration shim is carried (ADVICE r2 #2).
    """

    features: int
    kernel: int = 5
    stride: int = 2
    dtype: Dtype = jnp.float32
    packed: bool = False
    packed_io: bool = False  # input/output already in the (W/2, 2C) view
    fused_tap: bool = False  # return (kernel, bias) for a fused caller
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // 2 if self.packed_io else x.shape[-1]
        kern = self.param(
            "kernel",
            self.kernel_init,
            (self.kernel, self.kernel, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        if self.fused_tap:
            # caller fuses this conv into a larger kernel (ResBlock
            # pallas path); params are created HERE so the tree is
            # identical across the fused/unfused lowerings
            return kern, bias
        if self.packed_io:
            from ..ops.packed import conv_h2

            assert self.stride == 1 and self.kernel % 2 == 1
            # NOTE: no single-conv pallas routing here — measured
            # in-context loss (bench_mod_r3); the pallas win is the
            # FUSED ResBlock path (layers.ResBlock -> resblock_h2)
            return conv_h2(x, kern, bias, dtype=self.dtype, packed_io=True)
        if (
            self.packed
            and x.shape[2] % 2 == 0
            and self.kernel % 2 == 1
            and self.stride == 1
        ):
            from ..ops.packed import conv_h2

            return conv_h2(x, kern, bias, dtype=self.dtype)
        if (
            self.packed
            and x.shape[2] % 2 == 0
            and self.kernel % 2 == 1
            and self.stride == 2
        ):
            from ..ops.packed import conv_s2

            return conv_s2(x, kern, bias, dtype=self.dtype)
        p = self.kernel // 2
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kern.astype(self.dtype),
            (self.stride, self.stride),
            [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class Deconv(nn.Module):
    """Stride-2 transpose conv, output = input*stride (compressai `deconv`).

    phase_decomposed=True computes the IDENTICAL function as a regular
    conv emitting all stride^2 output phases as channels followed by a
    depth-to-space — profiling shows the native ConvTranspose lowering
    is HBM-bound on TPU (small-C full-res outputs pad their lane dim
    ~64x); the phase form writes stride^2-wider channels at the input
    resolution instead.  The parameter tree matches nn.ConvTranspose
    ({kernel (k,k,Cin,Cout), bias}).
    """

    features: int
    kernel: int = 5
    stride: int = 2
    dtype: Dtype = jnp.float32
    phase_decomposed: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kern = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if not self.phase_decomposed:
            p = jax.lax.conv_transpose(
                x.astype(self.dtype),
                kern.astype(self.dtype),
                (self.stride, self.stride),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return p + bias.astype(self.dtype)

        from ..ops.packed import deconv_phase

        return deconv_phase(
            x, kern, bias, stride=self.stride, dtype=self.dtype
        )


class SubpelConv(nn.Module):
    """conv(k) + PixelShuffle(r) upsampler (compressai subpel_conv3x3 /
    modules.py:250-254 subpel_conv1x1).

    packed: conv computed via the exact h2 lowering (layers.Conv)."""

    features: int
    r: int = 2
    kernel: int = 3
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features * self.r**2, self.kernel, 1, dtype=self.dtype,
                 packed=self.packed)(x)
        return pixel_shuffle(x, self.r)


class ResBottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck, LeakyReLU(slope)
    (modules.py:173-189)."""

    channels: int
    slope: float = 0.01
    dtype: Dtype = jnp.float32
    packed: bool = False  # convs via the exact h2 lowering (layers.Conv)

    @nn.compact
    def __call__(self, x):
        act = (lambda v: nn.relu(v)) if self.slope < 1e-4 else (lambda v: leaky_relu(v, self.slope))
        pk = self.packed and x.shape[2] % 2 == 0
        if pk:
            # whole block (convs + activations + residual add) in the
            # packed view: one reshape pair per block, adds stay fused
            xp = _pack_w(x)
            out = Conv(self.channels, 1, 1, dtype=self.dtype, packed_io=True)(xp)
            out = act(out)
            out = Conv(self.channels, 3, 1, dtype=self.dtype, packed_io=True)(out)
            out = act(out)
            out = Conv(self.channels, 1, 1, dtype=self.dtype, packed_io=True)(out)
            return _unpack_w(xp + out, self.channels)
        out = Conv(self.channels, 1, 1, dtype=self.dtype)(x)
        out = act(out)
        out = Conv(self.channels, 3, 1, dtype=self.dtype)(out)
        out = act(out)
        out = Conv(self.channels, 1, 1, dtype=self.dtype)(out)
        return x + out


class ResBlock(nn.Module):
    """Two 3x3 convs with residual (modules.py:192-214 ResBlock1)."""

    channels: int
    slope: float = 0.01
    start_from_relu: bool = True
    end_with_relu: bool = False
    bottleneck: bool = False
    dtype: Dtype = jnp.float32
    packed: bool = False  # convs via the exact h2 lowering (layers.Conv)

    @nn.compact
    def __call__(self, x):
        act = (lambda v: nn.relu(v)) if self.slope < 1e-4 else (lambda v: leaky_relu(v, self.slope))
        mid = self.channels // 2 if self.bottleneck else self.channels
        pk = self.packed and x.shape[2] % 2 == 0
        if pk:
            from ..ops import pallas_conv

            xp = _pack_w(x)
            if (
                pallas_conv.active()
                and self.channels == 64
                and mid == 64
                and x.shape[0] == 1
                and pallas_conv.pick_twp(xp.shape[2])
            ):
                # whole block as ONE pallas kernel: both convs +
                # activations + residual add per tile, h never in HBM
                k1, b1 = Conv(mid, 3, 1, dtype=self.dtype, packed_io=True,
                              fused_tap=True)(xp)
                k2, b2 = Conv(self.channels, 3, 1, dtype=self.dtype,
                              packed_io=True, fused_tap=True)(xp)
                out = pallas_conv.resblock_module_apply(
                    xp, k1, b1, k2, b2,
                    slope=None if self.slope < 1e-4 else self.slope,
                    pre_act=self.start_from_relu,
                    post_act=self.end_with_relu,
                    dtype=self.dtype,
                )
                return _unpack_w(out, self.channels)
            out = act(xp) if self.start_from_relu else xp
            out = Conv(mid, 3, 1, dtype=self.dtype, packed_io=True)(out)
            out = act(out)
            out = Conv(self.channels, 3, 1, dtype=self.dtype, packed_io=True)(out)
            if self.end_with_relu:
                out = act(out)
            return _unpack_w(xp + out, self.channels)
        out = act(x) if self.start_from_relu else x
        out = Conv(mid, 3, 1, dtype=self.dtype)(out)
        out = act(out)
        out = Conv(self.channels, 3, 1, dtype=self.dtype)(out)
        if self.end_with_relu:
            out = act(out)
        return x + out


class SELayer(nn.Module):
    """Squeeze-excitation channel gate (modules.py:217-230)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32
    packed_io: bool = False  # x is the (W/2, 2C) packed view

    @nn.compact
    def __call__(self, x):
        if self.packed_io:
            B, h, w2, _ = x.shape
            y = x.reshape(B, h, w2, 2, self.channels).mean(axis=(1, 2, 3))
        else:
            y = x.mean(axis=(1, 2))  # (B, C)
        y = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.sigmoid(y)
        if self.packed_io:
            y = jnp.tile(y, (1, 2))
        return x * y[:, None, None, :]


class ConvBlockResidual(nn.Module):
    """conv-LReLU-conv-SE with 1x1 shortcut (modules.py:233-247)."""

    features: int
    se_layer: bool = True
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        pk = self.packed and x.shape[2] % 2 == 0
        if pk:
            xp = _pack_w(x)
            h = Conv(self.features, 3, 1, dtype=self.dtype, packed_io=True)(xp)
            h = leaky_relu(h, 0.01)
            h = Conv(self.features, 3, 1, dtype=self.dtype, packed_io=True)(h)
            if self.se_layer:
                h = SELayer(self.features, dtype=self.dtype, packed_io=True)(h)
            s = Conv(self.features, 1, 1, dtype=self.dtype, packed_io=True)(xp)
            return _unpack_w(s + h, self.features)
        h = Conv(self.features, 3, 1, dtype=self.dtype)(x)
        h = leaky_relu(h, 0.01)
        h = Conv(self.features, 3, 1, dtype=self.dtype)(h)
        if self.se_layer:
            h = SELayer(self.features, dtype=self.dtype)(h)
        s = Conv(self.features, 1, 1, dtype=self.dtype)(x)
        return s + h


class UNet(nn.Module):
    """3-scale UNet with 4x ResBlock context refine (modules.py:257-300).

    packed: full-res and /2-level convs use the exact h2 lowering
    (layers.Conv); the /4 level already has C=128 and stays plain."""

    out_ch: int = 64
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        pk = self.packed
        x1 = ConvBlockResidual(32, dtype=self.dtype, packed=pk)(x)
        x2 = max_pool(x1, 2, 2, 0)
        x2 = ConvBlockResidual(64, dtype=self.dtype, packed=pk)(x2)
        x3 = max_pool(x2, 2, 2, 0)
        x3 = ConvBlockResidual(128, dtype=self.dtype)(x3)
        for _ in range(4):
            x3 = ResBlock(128, slope=0.0, dtype=self.dtype)(x3)

        d3 = SubpelConv(64, 2, 1, dtype=self.dtype)(x3)
        d3 = jnp.concatenate([x2, d3], axis=-1)
        d3 = ConvBlockResidual(64, dtype=self.dtype, packed=pk)(d3)

        d2 = SubpelConv(32, 2, 1, dtype=self.dtype, packed=pk)(d3)
        d2 = jnp.concatenate([x1, d2], axis=-1)
        d2 = ConvBlockResidual(self.out_ch, dtype=self.dtype, packed=pk)(d2)
        return d2


class RefineNet(nn.Module):
    """x + refine(cat[x, ref]) through 3 bottleneck blocks
    (modules.py:303-315); used for decoded MV and residual."""

    hidden: int = 64
    out_ch: int = 2
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x, ref):
        h = jnp.concatenate([x, ref], axis=-1)
        h = Conv(self.hidden, 3, 1, dtype=self.dtype, packed=self.packed)(h)
        for _ in range(3):
            h = ResBottleneckBlock(self.hidden, dtype=self.dtype,
                                   packed=self.packed)(h)
        h = Conv(self.out_ch, 3, 1, dtype=self.dtype, packed=self.packed)(h)
        return x + h


class Reconstruction(nn.Module):
    """Texture layer: dual UNets + learned 3-way blending
    (modules.py:318-358); returns (recurrent feature, recon)."""

    channels: int = 64
    out_ch: int = 3
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        pk = self.packed
        feature = Conv(self.channels, 3, 1, dtype=self.dtype, packed=pk)(x)
        f1 = UNet(self.channels, dtype=self.dtype, packed=pk)(feature)
        f2 = UNet(self.channels, dtype=self.dtype, packed=pk)(feature)
        r1 = Conv(self.out_ch, 3, 1, dtype=self.dtype, packed=pk)(f1)
        r2 = Conv(self.out_ch, 3, 1, dtype=self.dtype, packed=pk)(f2)
        r3 = Conv(self.out_ch, 3, 1, dtype=self.dtype, packed=pk)(
            jnp.concatenate([f1, f2], axis=-1)
        )

        def weight_head(f, name):
            h = Conv(self.channels, 3, 1, dtype=self.dtype, packed=pk,
                     name=f"{name}_conv1")(f)
            h = ResBlock(self.channels, dtype=self.dtype, packed=pk,
                         name=f"{name}_rb")(h)
            h = Conv(3, 3, 1, dtype=self.dtype, packed=pk, name=f"{name}_conv2")(h)
            return nn.sigmoid(h)

        w1 = weight_head(f1, "weight1")
        w2 = weight_head(f2, "weight2")
        recon = w1 * r1 + w2 * r2 + (1.0 - w1 - w2) * r3
        return feature, recon


class FeatureExtraction(nn.Module):
    """3->nf conv + 3 ResBlocks, residual (modules.py:361-374); residual
    coding happens in this feature space."""

    nf: int = 64
    dtype: Dtype = jnp.float32
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.nf, 3, 1, dtype=self.dtype, packed=self.packed)(x)
        h = x
        for _ in range(3):
            h = ResBlock(self.nf, slope=0.0, dtype=self.dtype,
                         packed=self.packed)(h)
        return x + h
