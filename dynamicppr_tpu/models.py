"""Model layer: the PPR engines (alias of pprx.engine + drivers)."""

from pprx.engine.push import push_round, push_to_convergence
from pprx.engine.sparse import HybridGraph, push_to_convergence_hybrid, sparse_round
from pprx.engine.state import FORWARD, REVERSE, PprState, PushStats, init_state
from pprx.engine.update import apply_edge_batch
from pprx.graph.hybrid_stream import HybridStreamDriver
from pprx.graph.stream import StreamDriver

__all__ = [
    "push_round",
    "push_to_convergence",
    "HybridGraph",
    "push_to_convergence_hybrid",
    "sparse_round",
    "FORWARD",
    "REVERSE",
    "PprState",
    "PushStats",
    "init_state",
    "apply_edge_batch",
    "HybridStreamDriver",
    "StreamDriver",
]
