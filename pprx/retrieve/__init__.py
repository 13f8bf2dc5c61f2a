from pprx.retrieve.topk import topk_candidates, retrieve

__all__ = ["topk_candidates", "retrieve"]
