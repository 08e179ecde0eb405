"""Golden-vector tests: bitstream format stability.

Streams written by one build must decode in every future build (the
reference relies on this implicitly via trained checkpoints + CompressAI
version pins; here it is pinned explicitly).  If either hash changes, the
on-disk bitstream format changed — a breaking release.
"""

import hashlib

import numpy as np

from deepsvc_tpu.coder import decode_with_indexes, encode_with_indexes
from deepsvc_tpu.entropy import build_gaussian_tables, get_scale_table

GOLDEN_STREAM_SHA = "3df09312f5e4fef3d0645b599104341d019b71c0ac8d6b6c1c3c169d8770b9f8"
GOLDEN_STREAM_LEN = 2352
GOLDEN_GAUSSIAN_CDF_SHA = "adeecdefe98e29c2d95e9e7d7ee17215c5a2e3d3cbaed3d3b868b950e6248973"


def _vectors():
    table = build_gaussian_tables(get_scale_table())
    rng = np.random.default_rng(42)
    idx = rng.integers(0, 64, 4096).astype(np.int32)
    sym = np.round(rng.standard_normal(4096) * get_scale_table()[idx]).astype(np.int32)
    return table, sym, idx


class TestGoldenBitstream:
    def test_gaussian_cdf_table_pinned(self):
        table, _, _ = _vectors()
        assert hashlib.sha256(table.cdf.tobytes()).hexdigest() == GOLDEN_GAUSSIAN_CDF_SHA

    def test_encoded_stream_pinned(self):
        table, sym, idx = _vectors()
        s = encode_with_indexes(sym, idx, table)
        assert len(s) == GOLDEN_STREAM_LEN
        assert hashlib.sha256(s).hexdigest() == GOLDEN_STREAM_SHA

    def test_golden_stream_decodes(self):
        table, sym, idx = _vectors()
        s = encode_with_indexes(sym, idx, table)
        out = decode_with_indexes(s, idx, table)
        np.testing.assert_array_equal(out, sym)
