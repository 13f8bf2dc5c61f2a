from pprx.engine.state import PprState, PushStats, init_state
from pprx.engine.push import push_round, push_to_convergence
from pprx.engine.update import apply_edge_batch

__all__ = [
    "PprState",
    "PushStats",
    "init_state",
    "push_round",
    "push_to_convergence",
    "apply_edge_batch",
]
