from pprx.graph.io import (
    load_edge_list,
    save_packed,
    load_packed,
    synthetic_powerlaw_stream,
    synthetic_erdos_stream,
)

__all__ = [
    "load_edge_list",
    "save_packed",
    "load_packed",
    "synthetic_powerlaw_stream",
    "synthetic_erdos_stream",
]
