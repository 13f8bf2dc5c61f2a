"""Static CSR graph container and COO<->CSR conversion.

Reference counterpart (SURVEY.md §2.1 "Static CSR graph"): offsets/indices
arrays with out- and in-edge views and degree arrays. The TPU build keeps the
*canonical* edge set in COO form (a slice of the timestamped stream — see
``pprx.graph.dynamic``) and derives CSR/CSC views by sorting; sorting is
cheap and deterministic on TPU, whereas in-place CSR mutation is
scatter-heavy and shape-dynamic under jit.

Dangling-vertex convention: a vertex with out-degree 0 behaves as if it had a
single self-loop (its personalized walk never leaves it, so pi_v = e_v). The
exact oracle, the push engines and the dynamic-correction rules all use this
same convention; it is what makes the degree-0 branches of the correction
rules in ``pprx.engine.update`` exact.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Csr:
    """Compressed sparse row adjacency (one direction).

    offsets: int64[n+1] — row pointer array.
    indices: int32[m] — column indices, row-major concatenated.
    """

    n: int
    offsets: np.ndarray
    indices: np.ndarray

    @property
    def m(self) -> int:
        return int(self.indices.shape[0])

    def degrees(self) -> np.ndarray:
        return np.diff(self.offsets).astype(np.int32)

    def row(self, v: int) -> np.ndarray:
        return self.indices[self.offsets[v] : self.offsets[v + 1]]

    def to_coo(self) -> tuple[np.ndarray, np.ndarray]:
        deg = np.diff(self.offsets)
        src = np.repeat(np.arange(self.n, dtype=np.int32), deg)
        return src, self.indices.copy()


def coo_to_csr(src: np.ndarray, dst: np.ndarray, n: int) -> Csr:
    """Build a CSR over rows ``src`` with columns ``dst`` (stable order)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int32)
    order = np.argsort(src, kind="stable")
    counts = np.bincount(src, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return Csr(n=n, offsets=offsets, indices=dst[order])


def degrees_from_coo(src: np.ndarray, n: int) -> np.ndarray:
    return np.bincount(np.asarray(src, dtype=np.int64), minlength=n).astype(np.int32)
