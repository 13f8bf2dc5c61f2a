"""Typed configuration for the PPR engine.

Reference counterpart (SURVEY.md §5 "Config/flag system"): per-binary argv
flags — graph path, alpha (0.15), eps, window size W, slide size b, variant,
thread count. Here: frozen dataclasses consumed by the engine, the stream
driver, and the CLI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class PprConfig:
    """Parameters of the push-based PPR approximation.

    alpha: teleport probability (paper default 0.15).
    eps: residual tolerance. Forward push is converged when
        ``|r[v]| <= eps * max(d_out(v), 1)`` for every v; reverse push when
        ``|r[v]| <= eps``. Signed comparison via ``|.|`` because deletions
        drive residuals negative (SURVEY.md §2.2).
    max_rounds: hard cap on push rounds inside ``lax.while_loop`` (guard
        against pathological non-termination under jit).
    """

    alpha: float = 0.15
    eps: float = 1e-6
    max_rounds: int = 10_000

    def __post_init__(self):
        if not (0.0 < self.alpha < 1.0):
            raise ValueError(f"alpha must be in (0,1), got {self.alpha}")
        if self.eps <= 0.0:
            raise ValueError(f"eps must be positive, got {self.eps}")
        if self.max_rounds <= 0:
            raise ValueError(f"max_rounds must be positive, got {self.max_rounds}")


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Sliding-window edge-stream parameters (SURVEY.md §3.2).

    window: number of edges W in the live window.
    slide: batch size b per step — b edges inserted at the head and b
        deleted at the tail per slide.
    """

    window: int
    slide: int

    def __post_init__(self):
        if self.window <= 0 or self.slide <= 0:
            raise ValueError("window and slide must be positive")
        if self.slide > self.window:
            raise ValueError("slide must not exceed window")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the sharded engine (SURVEY.md §2.4, §3.5).

    rows: number of shards the vertex dimension is row-sharded over.
    srcs: number of shards for the query-source batch axis (data parallel);
        total devices = rows * srcs.
    bucket_capacity: per (src-shard -> dst-shard) frontier-exchange bucket
        capacity for the all-to-all path; None = auto (N_local).
    """

    rows: int = 1
    srcs: int = 1
    bucket_capacity: Optional[int] = None

    def __post_init__(self):
        if self.rows <= 0 or self.srcs <= 0:
            raise ValueError("rows and srcs must be positive")

    @property
    def n_devices(self) -> int:
        return self.rows * self.srcs
