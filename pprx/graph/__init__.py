from pprx.graph.csr import Csr, coo_to_csr, degrees_from_coo
from pprx.graph.io import (
    load_edge_list,
    save_packed,
    load_packed,
    synthetic_powerlaw_stream,
    synthetic_erdos_stream,
)

__all__ = [
    "Csr",
    "coo_to_csr",
    "degrees_from_coo",
    "load_edge_list",
    "save_packed",
    "load_packed",
    "synthetic_powerlaw_stream",
    "synthetic_erdos_stream",
]
