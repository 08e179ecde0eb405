"""Native rANS coder round-trip tests."""

import numpy as np
import pytest

from deepsvc_tpu.coder import (
    BufferedRansEncoder,
    RansDecoder,
    decode_with_indexes,
    encode_with_indexes,
)
from deepsvc_tpu.entropy import build_gaussian_tables, get_scale_table
from deepsvc_tpu.entropy.cdf import CdfTable, build_table_from_pmfs


def random_table(rng, rows=8, n_sym_max=32):
    pmf_lengths = rng.integers(2, n_sym_max, rows)
    max_len = int(pmf_lengths.max())
    pmfs = np.zeros((rows, max_len))
    for r in range(rows):
        p = rng.random(pmf_lengths[r]) + 1e-3
        pmfs[r, : pmf_lengths[r]] = p / p.sum() * 0.999
    tails = np.full(rows, 1e-3)
    offsets = rng.integers(-10, 10, rows)
    return build_table_from_pmfs(pmfs, tails, pmf_lengths, offsets)


class TestRansRoundTrip:
    def test_in_range_symbols(self, rng):
        table = random_table(rng)
        n = 5000
        indexes = rng.integers(0, table.rows, n).astype(np.int32)
        # values within each row's in-range span
        values = np.array(
            [rng.integers(0, table.length[i] - 2) + table.offset[i] for i in indexes],
            dtype=np.int32,
        )
        stream = encode_with_indexes(values, indexes, table)
        out = decode_with_indexes(stream, indexes, table)
        np.testing.assert_array_equal(out, values)

    def test_bypass_out_of_range(self, rng):
        table = random_table(rng)
        n = 2000
        indexes = rng.integers(0, table.rows, n).astype(np.int32)
        values = rng.integers(-100000, 100000, n).astype(np.int32)
        stream = encode_with_indexes(values, indexes, table)
        out = decode_with_indexes(stream, indexes, table)
        np.testing.assert_array_equal(out, values)

    def test_bypass_extreme_zigzag_boundary(self, rng):
        """overflow == UINT32_MAX (raw == INT32_MIN) must invert exactly;
        a 32-bit `overflow + 1` would wrap to 0 and decode garbage."""
        table = random_table(rng)
        indexes = np.arange(min(4, table.rows), dtype=np.int32)
        # encoder raw symbol = value - offset; force raw = INT32_MIN
        values = (np.int64(-(2**31)) + table.offset[indexes]).astype(np.int32)
        stream = encode_with_indexes(values, indexes, table)
        out = decode_with_indexes(stream, indexes, table)
        np.testing.assert_array_equal(out, values)

    def test_empty(self, rng):
        table = random_table(rng)
        stream = encode_with_indexes(
            np.zeros(0, np.int32), np.zeros(0, np.int32), table
        )
        out = decode_with_indexes(stream, np.zeros(0, np.int32), table)
        assert out.size == 0

    def test_streaming_decoder_slice_by_slice(self, rng):
        """The channel-AR decode pattern: one stream, many decode calls."""
        table = random_table(rng)
        enc = BufferedRansEncoder()
        slices = []
        for _ in range(8):
            n = int(rng.integers(10, 500))
            idx = rng.integers(0, table.rows, n).astype(np.int32)
            vals = rng.integers(-50, 50, n).astype(np.int32)
            enc.encode_with_indexes(vals, idx, table)
            slices.append((vals, idx))
        stream = enc.flush()

        dec = RansDecoder()
        dec.set_stream(stream)
        for vals, idx in slices:
            out = dec.decode_stream(idx, table)
            np.testing.assert_array_equal(out, vals)

    def test_compression_efficiency_near_entropy(self, rng):
        """Coded size must be within ~1% of the empirical entropy."""
        probs = np.array([0.5, 0.2, 0.15, 0.1, 0.04, 0.01])
        pmfs = probs[None, :] * 0.9999
        table = build_table_from_pmfs(
            pmfs, np.array([1e-4]), np.array([6]), np.array([0])
        )
        n = 200_000
        values = rng.choice(6, size=n, p=probs).astype(np.int32)
        indexes = np.zeros(n, np.int32)
        stream = encode_with_indexes(values, indexes, table)
        entropy_bits = -(probs * np.log2(probs)).sum() * n
        actual_bits = len(stream) * 8
        assert actual_bits < entropy_bits * 1.01 + 1024

    def test_gaussian_table_roundtrip(self, rng):
        table = build_gaussian_tables(get_scale_table())
        n = 20000
        indexes = rng.integers(0, 64, n).astype(np.int32)
        scales = get_scale_table()[indexes]
        values = np.round(rng.standard_normal(n) * scales).astype(np.int32)
        stream = encode_with_indexes(values, indexes, table)
        out = decode_with_indexes(stream, indexes, table)
        np.testing.assert_array_equal(out, values)

    def test_deterministic(self, rng):
        table = random_table(rng)
        idx = rng.integers(0, table.rows, 1000).astype(np.int32)
        vals = rng.integers(-5, 40, 1000).astype(np.int32)
        s1 = encode_with_indexes(vals, idx, table)
        s2 = encode_with_indexes(vals, idx, table)
        assert s1 == s2
