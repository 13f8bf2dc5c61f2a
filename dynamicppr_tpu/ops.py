"""Op layer: kernels and frontier machinery (alias of pprx.engine internals)."""

from pprx.engine.frontier import (
    CsrSnapshot,
    Overlay,
    build_snapshot,
    compact_frontier,
    expand,
)
from pprx.engine.pallas_push import csc_arrays, edge_sweep
from pprx.retrieve.topk import retrieve, topk_candidates

__all__ = [
    "CsrSnapshot",
    "Overlay",
    "build_snapshot",
    "compact_frontier",
    "expand",
    "csc_arrays",
    "edge_sweep",
    "retrieve",
    "topk_candidates",
]
