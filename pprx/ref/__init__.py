from pprx.ref.exact import exact_ppr, exact_ppr_matrix, transition_matrix
from pprx.ref.push import PushState, forward_push, reverse_push, apply_edge_event

__all__ = [
    "exact_ppr",
    "exact_ppr_matrix",
    "transition_matrix",
    "PushState",
    "forward_push",
    "reverse_push",
    "apply_edge_event",
]
