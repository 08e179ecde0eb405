"""ctypes bindings for the native streaming rANS coder.

Division of labor (SURVEY.md §2.5): the TPU computes integer symbols and
per-symbol CDF-row indexes as dense arrays; this host-side coder turns
them into/out of bytes.  The buffered encoder accumulates whole slices
and flushes once per latent — one host call per tensor, not per value.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..entropy.cdf import CdfTable
from .build import ensure_built

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(ensure_built()))

    lib.rans_encode_with_indexes.restype = ctypes.c_int
    lib.rans_encode_with_indexes.argtypes = [
        _i32p, _i32p, ctypes.c_int, _i32p, ctypes.c_int, _i32p, _i32p, _u8p, ctypes.c_int,
    ]
    lib.rans_decode_with_indexes.restype = ctypes.c_int
    lib.rans_decode_with_indexes.argtypes = [
        _u8p, ctypes.c_int, _i32p, ctypes.c_int, _i32p, ctypes.c_int, _i32p, _i32p, _i32p,
    ]
    lib.rans_encoder_new.restype = ctypes.c_void_p
    lib.rans_encoder_free.argtypes = [ctypes.c_void_p]
    lib.rans_encoder_push.argtypes = [
        ctypes.c_void_p, _i32p, _i32p, ctypes.c_int, _i32p, ctypes.c_int, _i32p, _i32p,
    ]
    lib.rans_encoder_flush.restype = ctypes.c_int
    lib.rans_encoder_flush.argtypes = [ctypes.c_void_p, _u8p, ctypes.c_int]
    lib.rans_decoder_new.restype = ctypes.c_void_p
    lib.rans_decoder_new.argtypes = [_u8p, ctypes.c_int]
    lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
    lib.rans_decoder_decode_stream.restype = ctypes.c_int
    lib.rans_decoder_decode_stream.argtypes = [
        ctypes.c_void_p, _i32p, ctypes.c_int, _i32p, ctypes.c_int, _i32p, _i32p, _i32p,
    ]
    _lib = lib
    return lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_i32p)


class BufferedRansEncoder:
    """Accumulates (symbols, indexes) batches; flush() emits one stream."""

    def __init__(self):
        self._lib = _load()
        self._h = self._lib.rans_encoder_new()

    def encode_with_indexes(self, symbols, indexes, table: CdfTable):
        symbols = _as_i32(symbols)
        indexes = _as_i32(indexes)
        if symbols.shape != indexes.shape:
            raise ValueError("symbols/indexes length mismatch")
        self._lib.rans_encoder_push(
            self._h,
            _ptr(symbols),
            _ptr(indexes),
            symbols.size,
            _ptr(table.cdf),
            table.cdf.shape[1],
            _ptr(table.length),
            _ptr(table.offset),
        )

    def flush(self) -> bytes:
        cap = 1 << 16
        while True:
            buf = np.empty(cap, dtype=np.uint8)
            r = self._lib.rans_encoder_flush(self._h, buf.ctypes.data_as(_u8p), cap)
            if r >= 0:
                return bytes(buf[:r].tobytes())
            cap = -r

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rans_encoder_free(self._h)
            self._h = None


class RansDecoder:
    """Streaming decoder: decode_stream() consumes one batch at a time."""

    def __init__(self):
        self._lib = _load()
        self._h = None

    def set_stream(self, stream: bytes):
        if self._h:
            self._lib.rans_decoder_free(self._h)
        buf = np.frombuffer(stream, dtype=np.uint8)
        buf = np.ascontiguousarray(buf)
        self._h = self._lib.rans_decoder_new(buf.ctypes.data_as(_u8p), buf.size)

    def decode_stream(self, indexes, table: CdfTable) -> np.ndarray:
        if self._h is None:
            raise RuntimeError("set_stream() first")
        indexes = _as_i32(indexes)
        out = np.empty(indexes.size, dtype=np.int32)
        self._lib.rans_decoder_decode_stream(
            self._h,
            _ptr(indexes),
            indexes.size,
            _ptr(table.cdf),
            table.cdf.shape[1],
            _ptr(table.length),
            _ptr(table.offset),
            _ptr(out),
        )
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.rans_decoder_free(self._h)
            self._h = None


def encode_with_indexes(symbols, indexes, table: CdfTable) -> bytes:
    """One-shot encode of a full (symbols, indexes) tensor pair."""
    enc = BufferedRansEncoder()
    enc.encode_with_indexes(symbols, indexes, table)
    return enc.flush()


def decode_with_indexes(stream: bytes, indexes, table: CdfTable) -> np.ndarray:
    dec = RansDecoder()
    dec.set_stream(stream)
    return dec.decode_stream(indexes, table)
