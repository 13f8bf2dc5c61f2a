"""Utility layer: io/config/eval/logging (alias of the pprx counterparts)."""

from pprx.config import MeshConfig, PprConfig, StreamConfig
from pprx.eval.metrics import l1_error, max_error, precision_at_k
from pprx.eval.perf import PerfReport, summarize
from pprx.graph.io import (
    load_edge_list,
    load_packed,
    save_packed,
    synthetic_erdos_stream,
    synthetic_powerlaw_stream,
)
from pprx.io.checkpoint import load_checkpoint, save_checkpoint
from pprx.logging import JsonlLogger

__all__ = [
    "MeshConfig",
    "PprConfig",
    "StreamConfig",
    "l1_error",
    "max_error",
    "precision_at_k",
    "PerfReport",
    "summarize",
    "load_edge_list",
    "load_packed",
    "save_packed",
    "synthetic_erdos_stream",
    "synthetic_powerlaw_stream",
    "load_checkpoint",
    "save_checkpoint",
    "JsonlLogger",
]
