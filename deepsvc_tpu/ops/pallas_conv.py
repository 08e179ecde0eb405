"""Pallas MXU kernel for the hot conv shape: 3x3 stride-1 at C=64, h2 view.

Parity role: the stride-1 conv chains of the MC/texture stages
(reference modules.py:233-374, video_model.py:34-63) — the measured hot
spot of the whole codec (bench_stages: mc_stage 184 ms + recon_stage
152 ms of a ~980 ms 1080p frame, both run on encode AND decode).

Why a hand kernel: honest probes (bench_hot.py — chained dispatches,
random weights) put XLA's conv emitter at ~30-45 TF/s for every exact
variant of this shape (NHWC plain, h2, s2) against a measured 357 TF/s
matmul peak.  The earlier "XLA conv is the speed of light" conclusion
(ARCHITECTURE.md item 7) traced to bench_conv2.py timing convs with
ZERO kernels (constant-foldable) and per-call sync on a ~35 ms relay.

Design: in the h2 view (B, H, W/2, 2C) a 3x3 stride-1 conv is EXACTLY
9 lane-aligned (2C -> 2O) matmul taps (ops/packed.py `_h2_map`): packed
tap (ky, px) of the scattered kernel Kp[ky, px] multiplies the window
row shifted by (ky-1) rows / (px-1) packed cols.  With 2C = 2O = 128
every tap is a full-tile (M, 128) @ (128, 128) MXU pass — no im2col
shuffles, no lane padding.  FLOP inflation vs the true conv is 2x
(structural zeros in Kp), leaving a 178 TF/s effective ceiling; the
grid pipelines (TH, TWp) output tiles while each tile's input window
(+1 halo per side) is DMA'd from HBM into VMEM scratch.

The kernel fuses bias, LeakyReLU, and an optional residual add — the
whole `x + conv(lrelu(conv(x)))` block body runs as two kernel calls
with zero intermediate elementwise passes over HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packed import _h2_map


_ENABLED = False


def enable(on: bool = True) -> None:
    """Route qualifying stride-1 3x3 convs through the pallas kernel.

    Called by the bitstream runtimes (forward-only path).  Training
    keeps the XLA lowering: the kernel carries no custom VJP, and the
    cascade trainers differentiate through every conv.
    """
    global _ENABLED
    _ENABLED = on


def active() -> bool:
    """True when enabled AND the default backend is a real TPU.

    CPU test runs (conftest pins jax_platforms=cpu) fall back to the
    XLA lowering — Mosaic kernels don't compile for the CPU backend.
    """
    return _ENABLED and jax.default_backend() != "cpu"


def pick_twp(wp: int) -> int | None:
    """Largest 8-aligned tile width dividing the packed width, if any."""
    for c in (120, 112, 96, 80, 64, 56, 48, 40, 32, 24, 16, 8):
        if wp % c == 0:
            return c
    return None


def conv_module_apply(xp, K, bias, *, dtype):
    """layers.Conv adapter: packed-io h2 conv via the pallas kernel.

    xp (1, H, Wp, 2C) with 2C a multiple of 128; K (3, 3, C, 64) f32
    module params; bias (64,) f32 (added in f32 inside the kernel).
    """
    twp = pick_twp(xp.shape[2])
    Kp = h2_pack_kernel3(K, dtype)
    return conv3x3_h2(
        xp.astype(dtype), Kp, jnp.tile(bias.astype(jnp.float32), 2),
        twp=twp,
    )


def h2_pack_kernel3(K: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(3, 3, C, O) unpacked kernel -> (3, 3, 2C, 2O) h2-scattered taps.

    Same einsum as ops.packed.conv_h2 (kept as the XLA reference path);
    tap (ky, px) maps packed input col j+px-1 to packed output col j.
    """
    k = K.shape[0]
    assert k == 3 and K.shape[1] == 3, "3x3 only"
    C, O = K.shape[2], K.shape[3]
    M = jnp.asarray(_h2_map(3), dtype)
    return jnp.einsum("pedx,yxco->ypecdo", M, K.astype(dtype)).reshape(
        3, 3, 2 * C, 2 * O
    )


def _conv_kernel(slope, has_add, TH, TWp, CI, out_dtype):
    def kernel(*refs):
        if has_add:
            x_hbm, w_ref, b_ref, a_ref, o_ref, xs_ref, sem = refs
        else:
            x_hbm, w_ref, b_ref, o_ref, xs_ref, sem = refs
            a_ref = None
        i = pl.program_id(0)
        j = pl.program_id(1)
        # window is (TH+2, TWp+8): Mosaic requires HBM slice extents in
        # the sublane dim to be 8-aligned, so the +2-halo window is
        # over-copied by 6 cols (input is right-padded to match)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TH, TH + 2), pl.ds(j * TWp, TWp + 8), :],
            xs_ref,
            sem,
        )
        cp.start()
        cp.wait()
        acc = None
        for ky in range(3):
            for px in range(3):
                xs = xs_ref[ky : ky + TH, px : px + TWp, :].reshape(
                    TH * TWp, CI
                )
                d = jax.lax.dot_general(
                    xs,
                    w_ref[ky, px],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        out = acc + b_ref[0].astype(jnp.float32)
        if slope is not None:
            out = jnp.where(out >= 0, out, jnp.float32(slope) * out)
        out = out.reshape(TH, TWp, 128)
        if a_ref is not None:
            out = out + a_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(out_dtype)

    return kernel


def _rb_kernel(slope, pre_act, post_act, TH, TWp, H, Wp, nsteps, out_dtype):
    """Fused ResBlock body: y = x + [act](conv2(act(conv1([act](x))))).

    One double-buffered window DMA per (TH, TWp) output tile feeds BOTH
    convs; the intermediate h never touches HBM.  h is masked to zero
    outside the true image so the fused result matches the unfused
    SAME-conv pair exactly (conv2's halo reads of conv1's output are
    zeros beyond the image in the unfused form)."""

    def act(v):
        if slope is None:
            return jnp.maximum(v, 0.0)
        return jnp.where(v >= 0, v, jnp.float32(slope) * v)

    def kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               win0, win1, sem0, sem1):
        nW = pl.num_programs(1)
        i = pl.program_id(0)
        j = pl.program_id(1)
        step = i * nW + j
        wins = (win0, win1)
        sems = (sem0, sem1)

        def copy_for(s, slot):
            ii = s // nW
            jj = s % nW
            return pltpu.make_async_copy(
                x_hbm.at[
                    pl.ds(ii * TH, TH + 4), pl.ds(jj * TWp, TWp + 16), :
                ],
                wins[slot],
                sems[slot],
            )

        @pl.when(step == 0)
        def _():
            copy_for(step, 0).start()

        @pl.when(jnp.logical_and(step + 1 < nsteps, step % 2 == 0))
        def _():
            copy_for(step + 1, 1).start()

        @pl.when(jnp.logical_and(step + 1 < nsteps, step % 2 == 1))
        def _():
            copy_for(step + 1, 0).start()

        def compute(win, sem_slot):
            copy_for(step, sem_slot).wait()
            w = win[...]
            w0 = act(w.astype(jnp.float32)).astype(w.dtype) if pre_act else w
            # conv1 on the (TH+2, TWp+8) halo extension of the tile
            M1 = (TH + 2) * (TWp + 8)
            acc = None
            for ky in range(3):
                for px in range(3):
                    xs = w0[ky : ky + TH + 2, px : px + TWp + 8, :].reshape(
                        M1, 128
                    )
                    d = jax.lax.dot_general(
                        xs, w1_ref[ky, px],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
            h = act(acc + b1_ref[0].astype(jnp.float32))
            h = h.reshape(TH + 2, TWp + 8, 128)
            # h position (rh, c) is global (i*TH + rh - 1, j*TWp + c - 1);
            # zero outside the image = unfused SAME-conv halo semantics
            gr = i * TH - 1 + jax.lax.broadcasted_iota(
                jnp.int32, (TH + 2, TWp + 8, 128), 0
            )
            gc = j * TWp - 1 + jax.lax.broadcasted_iota(
                jnp.int32, (TH + 2, TWp + 8, 128), 1
            )
            valid = (gr >= 0) & (gr < H) & (gc >= 0) & (gc < Wp)
            h = jnp.where(valid, h, 0.0).astype(w.dtype)
            M2 = TH * TWp
            acc2 = None
            for ky in range(3):
                for px in range(3):
                    hs = h[ky : ky + TH, px : px + TWp, :].reshape(M2, 128)
                    d = jax.lax.dot_general(
                        hs, w2_ref[ky, px],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc2 = d if acc2 is None else acc2 + d
            out = acc2 + b2_ref[0].astype(jnp.float32)
            if post_act:
                out = act(out)
            res = w[2 : 2 + TH, 2 : 2 + TWp, :].reshape(M2, 128)
            out = out + res.astype(jnp.float32)
            o_ref[...] = out.reshape(TH, TWp, 128).astype(out_dtype)

        @pl.when(step % 2 == 0)
        def _():
            compute(win0, 0)

        @pl.when(step % 2 == 1)
        def _():
            compute(win1, 1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("slope", "pre_act", "post_act", "th", "twp",
                     "interpret"),
)
def resblock_h2(
    xp: jnp.ndarray,
    Kp1: jnp.ndarray,
    b1: jnp.ndarray,
    Kp2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    slope: float | None = 0.01,
    pre_act: bool = True,
    post_act: bool = False,
    th: int = 32,
    twp: int = 120,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused h2 ResBlock: xp + [act](conv2(act(conv1([act](xp))))).

    xp (1, H, Wp, 128); Kp1/Kp2 (3, 3, 128, 128) h2-scattered 3x3
    kernels; b1/b2 (128,) tiled biases; slope None = ReLU.  Matches the
    unfused packed_io Conv pair bit-for-bit in f32 (bf16: f32 accum +
    f32 activation inside, cast once per conv).
    """
    B, H, Wp, CC = xp.shape
    assert B == 1 and CC == 128
    assert Kp1.shape == (3, 3, 128, 128) and Kp2.shape == (3, 3, 128, 128)
    assert Wp % twp == 0 and twp % 8 == 0, (Wp, twp)
    Hp = -(-H // th) * th
    x = jnp.pad(xp[0], ((2, 2 + (Hp - H)), (2, 14), (0, 0)))
    grid = (Hp // th, Wp // twp)
    nsteps = grid[0] * grid[1]
    kern = _rb_kernel(slope, pre_act, post_act, th, twp, H, Wp, nsteps,
                      xp.dtype)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, twp, 128), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, 128), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, twp + 16, 128), xp.dtype),
            pltpu.VMEM((th + 4, twp + 16, 128), xp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, Kp1, b1.reshape(1, 128), Kp2, b2.reshape(1, 128))
    return out[None, :H]


def resblock_module_apply(xp, K1, bias1, K2, bias2, *, slope, pre_act,
                          post_act, dtype):
    """layers.ResBlock adapter: fused pallas block on the packed view."""
    twp = pick_twp(xp.shape[2])
    return resblock_h2(
        xp.astype(dtype),
        h2_pack_kernel3(K1, dtype),
        jnp.tile(bias1.astype(jnp.float32), 2),
        h2_pack_kernel3(K2, dtype),
        jnp.tile(bias2.astype(jnp.float32), 2),
        slope=slope, pre_act=pre_act, post_act=post_act, twp=twp,
    )


@functools.partial(
    jax.jit,
    static_argnames=("slope", "th", "twp", "interpret"),
)
def conv3x3_h2(
    xp: jnp.ndarray,
    Kp: jnp.ndarray,
    bias2: jnp.ndarray,
    add: jnp.ndarray | None = None,
    *,
    slope: float | None = None,
    th: int = 64,
    twp: int = 120,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME 3x3 stride-1 conv on the h2 view, fused bias/LReLU/residual.

    xp:    (1, H, Wp, CI) packed input (Wp = W/2, CI = 2*Cin, a multiple
           of 128 — e.g. concat inputs give CI = 256).
    Kp:    (3, 3, CI, 128) from :func:`h2_pack_kernel3` (2*Cout = 128).
    bias2: (128,) = tile(bias, 2) in packed channel order.
    add:   optional (1, H, Wp, 128) residual, added AFTER activation.
    slope: LeakyReLU negative slope (None = linear).

    Returns (1, H, Wp, 128), xp.dtype.  Rows are processed in (th, twp)
    tiles; H is zero-padded up to a tile multiple internally (zero rows
    convolve to bias-only outputs that are cropped before return).
    """
    B, H, Wp, CC = xp.shape
    assert B == 1 and CC % 128 == 0 and Kp.shape == (3, 3, CC, 128)
    assert Wp % twp == 0 and twp % 8 == 0, (Wp, twp)
    Hp = -(-H // th) * th
    x = xp[0]
    # halo pad: 1 row / 1 packed col of zeros each side (+ row padding up
    # to the tile multiple); SAME conv semantics exactly as conv_h2.
    # Right x-pad is 7 so every (twp+8)-wide aligned DMA window exists.
    x = jnp.pad(x, ((1, 1 + (Hp - H)), (1, 7), (0, 0)))
    grid = (Hp // th, Wp // twp)
    kern = _conv_kernel(slope, add is not None, th, twp, CC, xp.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, Kp, bias2.reshape(1, 128)]
    if add is not None:
        in_specs.append(
            pl.BlockSpec((th, twp, 128), lambda i, j: (i, j, 0))
        )
        a = add[0]
        if Hp != H:
            a = jnp.pad(a, ((0, Hp - H), (0, 0), (0, 0)))
        args.append(a)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((th, twp, 128), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, 128), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, twp + 8, CC), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return out[None, :H]
