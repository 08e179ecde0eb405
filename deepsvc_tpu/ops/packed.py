"""Exact space-to-depth conv lowering (TPU MXU-regime packing).

Measured on v5e (bench_conv*.py): NHWC convs at 1080p with C in {3..64}
run at 2-21 TF/s, while the same-FLOP convs at half spatial resolution
with C in {128, 256} hit 200-300 TF/s (~60% MFU).  The difference is
lane/tile utilization: bf16 tiles are (16, 128), so C < 128 wastes
lanes, and full-1080p spatial extents defeat XLA's VMEM blocking.

This module lowers a stride-1 odd-kernel conv EXACTLY into that fast
regime:

    y = conv_k(x, K)         on (B, H,   W,   C)
      = d2s( conv_pk( s2d(x), pack_kernel(K) ) )   on (B, H/b, W/b, b^2 C)

where pack_kernel scatters the k x k taps into a pk x pk packed kernel
(pk = the block span of the taps).  FLOP inflation vs the original conv:
3x3 -> 3x3 packed (4x), 5x5 -> 3x3 (1.44x), 7x7 -> 5x5 (2.04x) for b=2 —
all net wins of 3-8x at the measured rates.  The transform is exact
(same parameters, same function); only float reassociation differs.

Packed channel layout is phase-major: packed[..., (dy*b + dx)*C + c] =
x[..., b*i + dy, b*j + dx, c].  Concatenating packed tensors yields a
segmented layout ([phases x C1] ++ [phases x C2]); pass ``segments``
to ``pack_kernel``/``packed_conv`` so each input segment's kernel rows
scatter into the right packed positions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray, b: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), phase-major channels."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def depth_to_space(x: jnp.ndarray, b: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    B, h, w, CC = x.shape
    C = CC // (b * b)
    x = x.reshape(B, h, w, b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * b, w * b, C)


def packed_kernel_size(k: int, b: int = 2) -> int:
    """Block span pk of a k x k stride-1 conv's taps under b-packing."""
    c = k // 2
    lo = min((d + s) // b for d in range(b) for s in range(-c, c + 1))
    hi = max((d + s) // b for d in range(b) for s in range(-c, c + 1))
    return 2 * max(-lo, hi) + 1


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _scatter_map(k: int, b: int) -> "np.ndarray":
    """Constant 0/1 tensor M[pk, pk, e, d, ky, kx]: tap (ky, kx) of the
    original kernel contributes to packed position (pk_y, pk_x) with
    input phase e = ey*b+ex and output phase d = dy*b+dx."""
    pk = packed_kernel_size(k, b)
    P = pk // 2
    c = k // 2
    M = np.zeros((pk, pk, b * b, b * b, k, k), np.float32)
    for ky in range(k):
        for dy in range(b):
            ty = dy + ky - c
            by, ey = ty // b, ty % b
            for kx in range(k):
                for dx in range(b):
                    tx = dx + kx - c
                    bx, ex = tx // b, tx % b
                    M[by + P, bx + P, ey * b + ex, dy * b + dx, ky, kx] = 1.0
    return M


def pack_kernel(
    K: jnp.ndarray, b: int = 2, segments: Sequence[int] | None = None
) -> jnp.ndarray:
    """Scatter a (k, k, Cin, Cout) kernel to (pk, pk, b^2 Cin, b^2 Cout)
    via ONE einsum with a constant 0/1 map (cheap to trace/compile).

    ``segments``: true-channel sizes of each packed input segment when the
    packed input is a concatenation of separately-packed tensors
    (sum(segments) == Cin).  Default: one segment.
    """
    k, k2, Cin, Cout = K.shape
    assert k == k2 and k % 2 == 1, "odd square kernels only"
    segments = list(segments) if segments is not None else [Cin]
    assert sum(segments) == Cin
    pk = packed_kernel_size(k, b)
    M = jnp.asarray(_scatter_map(k, b), K.dtype)

    parts = []
    t0 = 0
    for seg in segments:
        Ks = K[:, :, t0 : t0 + seg, :]
        t0 += seg
        # (pk,pk,e,d,ky,kx) x (ky,kx,c,o) -> (pk,pk,e,c,d,o)
        Kp = jnp.einsum("pqedyx,yxco->pqecdo", M, Ks)
        parts.append(Kp.reshape(pk, pk, b * b * seg, b * b * Cout))
    return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]


def packed_conv(
    xp: jnp.ndarray,
    K: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    b: int = 2,
    segments: Sequence[int] | None = None,
    dtype=None,
) -> jnp.ndarray:
    """Stride-1 SAME conv on packed input, packed output.

    xp: (B, H/b, W/b, b^2 Cin) packed input; K: (k, k, Cin, Cout) the
    ORIGINAL unpacked kernel (parameters are stored unpacked so the
    function and its initialization are identical to a plain conv).
    """
    dt = dtype or xp.dtype
    Kp = pack_kernel(K, b, segments).astype(dt)
    pk = Kp.shape[0]
    p = pk // 2
    out = lax.conv_general_dilated(
        xp.astype(dt),
        Kp,
        (1, 1),
        [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), b * b)
    return out


@functools.lru_cache(maxsize=None)
def _h2_map(k: int) -> "np.ndarray":
    """Constant 0/1 map for horizontal (1x2) packing:
    M[pkx, ex, dx, kx] — tap kx contributes to packed x-position pkx with
    input x-phase ex and output x-phase dx."""
    c = k // 2
    los = min((dx + sx) // 2 for dx in range(2) for sx in range(-c, c + 1))
    his = max((dx + sx) // 2 for dx in range(2) for sx in range(-c, c + 1))
    pkx = his - los + 1
    Px = -los
    M = np.zeros((pkx, 2, 2, k), np.float32)
    for kx in range(k):
        sx = kx - c
        for dx in range(2):
            tx = dx + sx
            bx, ex = tx // 2, tx % 2
            M[bx + Px, ex, dx, kx] = 1.0
    return M


def conv_h2(x, K, bias=None, *, stride_y: int = 1, dtype=None,
            packed_io: bool = False):
    """Stride-1-in-x conv via EXACT horizontal (1x2) packing.

    (B, H, W, C) -> reshape (B, H, W/2, 2C) [free: contiguous] -> conv
    with the h2-scattered kernel -> reshape back.  2C doubles lane
    utilization; FLOP inflation is 2x for 3x3, 1.2x for 5x5, 10/7x for
    7x7 — measured net 1.2-1.9x faster at 1080p for C in {32, 64}.

    packed_io=True: ``x`` is ALREADY the (B, H, W/2, 2C) packed view and
    the packed output is returned without reshaping back — lets blocks
    chain convs + elementwise ops entirely in the packed layout so XLA
    keeps them fused (the reshape boundaries otherwise materialize as
    layout copies between every conv and its residual add).
    """
    k = K.shape[0]
    C = K.shape[2]
    O = K.shape[3]
    dt = dtype or x.dtype
    M = jnp.asarray(_h2_map(k), dt)
    pkx = M.shape[0]
    # (pkx,e,d,kx) x (ky,kx,c,o) -> (ky, pkx, e*C+c, d*O+o)
    Kp = jnp.einsum("pedx,yxco->ypecdo", M, K.astype(dt)).reshape(
        k, pkx, 2 * C, 2 * O
    )
    if packed_io:
        xp = x.astype(dt)
    else:
        B, H, W, _ = x.shape
        xp = x.astype(dt).reshape(B, H, W // 2, 2 * C)
    out = lax.conv_general_dilated(
        xp,
        Kp,
        (stride_y, 1),
        [(k // 2, k // 2), (pkx // 2, pkx // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), 2)
    if packed_io:
        return out
    return out.reshape(B, H // stride_y, W, O)


@functools.lru_cache(maxsize=None)
def _deconv_phase_map(k: int, s: int):
    """Phase decomposition of lax.conv_transpose(..., 'SAME', stride s).

    Returns (M, pad_lo, pad_hi): M[t, d, ki] is 1 where original tap ki
    contributes to output phase d at input-grid offset t (window index),
    so  deconv(x)[s*m + d] = sum_{t,ki} M[t,d,ki] K[ki] x[m + t - pad_lo].
    """
    # lax _conv_transpose_padding('SAME')
    pad_len = k + s - 2
    if s > k - 1:
        pad_a = k - 1
    else:
        pad_a = int(np.ceil(pad_len / 2))

    contrib = {}  # (d, i) -> offset o
    offsets = set()
    for d in range(s):
        for i in range(k):
            num = d + i - pad_a
            if num % s == 0:
                o = num // s
                contrib[(d, i)] = o
                offsets.add(o)
    omin, omax = min(offsets), max(offsets)
    win = omax - omin + 1
    M = np.zeros((win, s, k), np.float32)
    for (d, i), o in contrib.items():
        M[o - omin, d, i] = 1.0
    return M, -omin, omax


def deconv_phase(x, K, bias=None, *, stride: int = 2, dtype=None):
    """EXACT stride-s transpose conv as one regular conv emitting the
    s^2 output phases as channels, followed by depth-to-space.

    Matches lax.conv_transpose(x, K, (s, s), 'SAME') numerically.  On
    TPU the native transpose-conv lowering writes full-resolution
    small-C outputs whose lane dim is padded up to 128 (HBM-bound); the
    phase form writes s^2-wider channels at input resolution.
    """
    B, H, W, C = x.shape
    k = K.shape[0]
    O = K.shape[3]
    dt = dtype or x.dtype
    My, plo, phi = _deconv_phase_map(k, stride)
    M = jnp.asarray(My, dt)
    # (t,d,ki) x (t2,d2,ki2) over K -> (t, t2, c, (d,d2,o))
    Kp = jnp.einsum("tdy,uex,yxco->tucdeo", M, M, K.astype(dt)).reshape(
        My.shape[0], My.shape[0], C, stride * stride * O
    )
    out = lax.conv_general_dilated(
        x.astype(dt),
        Kp,
        (1, 1),
        [(plo, phi), (plo, phi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), stride * stride)
    return depth_to_space(out, stride)


@functools.lru_cache(maxsize=None)
def _h2_s2_map(k: int):
    """Constant 0/1 map for a stride-2-in-x conv consumed from the h2
    view: only output phase dx=0 exists.  Returns (M[pkx, ex, kx],
    pad_lo, pad_hi) with pad_lo + pad_hi == pkx - 1 (same-size output)."""
    c = k // 2
    los = min(sx // 2 for sx in range(-c, c + 1))
    his = max(sx // 2 for sx in range(-c, c + 1))
    pkx = his - los + 1
    M = np.zeros((pkx, 2, k), np.float32)
    for kx in range(k):
        sx = kx - c
        M[sx // 2 - los, sx % 2, kx] = 1.0
    return M, -los, his


def conv_s2(x, K, bias=None, *, dtype=None):
    """EXACT stride-2 conv computed from the (W/2, 2C) packed view.

    Output is the ordinary strided-conv output (H/2, W/2, O) — x-stride
    2 means only packed phase dx=0 is emitted, so there is NO FLOP
    inflation in x (k taps -> ceil((k+1)/2) packed taps on 2C channels)
    while input lane utilization doubles.
    """
    B, H, W, C = x.shape
    k = K.shape[0]
    O = K.shape[3]
    dt = dtype or x.dtype
    My, plo, phi = _h2_s2_map(k)
    M = jnp.asarray(My, dt)
    pkx = M.shape[0]
    # (pkx,e,kx) x (ky,kx,c,o) -> (ky, pkx, e*C+c, o)
    Kp = jnp.einsum("pex,yxco->ypeco", M, K.astype(dt)).reshape(k, pkx, 2 * C, O)
    xp = x.astype(dt).reshape(B, H, W // 2, 2 * C)
    out = lax.conv_general_dilated(
        xp,
        Kp,
        (2, 1),
        [(k // 2, k // 2), (plo, phi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(dt)
    return out


def packed_group_reduce(xp: jnp.ndarray, op: str = "max", b: int = 2) -> jnp.ndarray:
    """b x b stride-b spatial pooling of the TRUE tensor, computed as a
    channel-phase reduction on the packed tensor.  Returns the UNPACKED
    result at true resolution / b (= packed spatial resolution)."""
    B, h, w, CC = xp.shape
    C = CC // (b * b)
    v = xp.reshape(B, h, w, b * b, C)
    if op == "max":
        return v.max(axis=3)
    if op == "mean":
        return v.mean(axis=3)
    raise ValueError(op)
