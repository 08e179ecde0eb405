"""Integer quantized-CDF construction (host side).

Replaces the native ``pmf_to_quantized_cdf`` the reference pulls from its
entropy-coding dependency (SURVEY.md §2.5).  All arithmetic is exact
integer so tables are bit-identical across hosts — a decode-correctness
requirement for the range coder.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

PRECISION = 16


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = PRECISION) -> np.ndarray:
    """Quantize a pmf (tail mass included as last entry) to an integer CDF.

    Returns int32 cdf of length len(pmf)+1 with cdf[0] = 0,
    cdf[-1] = 2**precision, and every symbol frequency >= 1.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if np.any(np.isnan(pmf)):
        raise ValueError("pmf contains NaN")
    pmf = np.maximum(pmf, 0.0)
    n = pmf.shape[0]
    total = 1 << precision

    freq = np.round(pmf * total).astype(np.int64)
    s = int(freq.sum())
    if s == 0:
        freq[:] = 1
        s = n
    # rescale to exactly `total`
    freq = (freq.astype(np.uint64) * np.uint64(total) // np.uint64(max(s, 1))).astype(np.int64)
    cdf = np.zeros(n + 1, dtype=np.int64)
    cdf[1:] = np.cumsum(freq)
    cdf[-1] = total
    # repair zero-frequency symbols by stealing from the smallest freq > 1
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            freqs = cdf[1:] - cdf[:-1]
            candidates = np.where(freqs > 1)[0]
            if candidates.size == 0:
                raise ValueError("cannot repair degenerate pmf")
            best = candidates[np.argmin(freqs[candidates])]
            if best < i:
                cdf[best + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best + 1] += 1
    assert cdf[0] == 0 and cdf[-1] == total
    assert np.all(cdf[1:] > cdf[:-1]), "CDF must be strictly increasing"
    return cdf.astype(np.int32)


@dataclass
class CdfTable:
    """Ragged bank of per-row quantized CDFs consumed by the range coder.

    - ``cdf``: (rows, max_len) int32, row r valid up to ``length[r]``
    - ``length``: (rows,) int32 — number of valid cdf entries in the row
      (= number of symbols + 1; the last symbol is the bypass escape)
    - ``offset``: (rows,) int32 — symbol id = raw_value - offset
    """

    cdf: np.ndarray
    length: np.ndarray
    offset: np.ndarray

    def __post_init__(self):
        self.cdf = np.ascontiguousarray(self.cdf, dtype=np.int32)
        self.length = np.ascontiguousarray(self.length, dtype=np.int32)
        self.offset = np.ascontiguousarray(self.offset, dtype=np.int32)

    @property
    def rows(self) -> int:
        return self.cdf.shape[0]

    def max_symbol(self, row: int) -> int:
        """Largest in-range symbol id (the escape symbol) for a row."""
        return int(self.length[row]) - 2


def build_table_from_pmfs(
    pmfs: np.ndarray,
    tail_masses: np.ndarray,
    pmf_lengths: np.ndarray,
    offsets: np.ndarray,
    precision: int = PRECISION,
) -> CdfTable:
    """Pack per-row pmfs (+ tail mass escape symbol) into a CdfTable."""
    rows = pmfs.shape[0]
    max_len = int(pmf_lengths.max()) + 2
    cdf = np.zeros((rows, max_len), dtype=np.int32)
    lengths = np.zeros(rows, dtype=np.int32)
    for r in range(rows):
        n = int(pmf_lengths[r])
        row_pmf = np.concatenate([pmfs[r, :n], [max(float(tail_masses[r]), 1e-12)]])
        row_cdf = pmf_to_quantized_cdf(row_pmf, precision)
        cdf[r, : n + 2] = row_cdf
        lengths[r] = n + 2
    return CdfTable(cdf=cdf, length=lengths, offset=np.asarray(offsets, dtype=np.int32))
