from pprx.eval.metrics import l1_error, max_error, precision_at_k
from pprx.eval.perf import PerfReport, summarize

__all__ = ["l1_error", "max_error", "precision_at_k", "PerfReport", "summarize"]
