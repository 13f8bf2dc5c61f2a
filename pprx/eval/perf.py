"""Throughput derivation from device-side counters (SURVEY.md §5 tracing).

Turns PushStats + wall clock into the [BASELINE] metric trio:
edge updates/s, pushes/s/chip, and (from pprx.eval.metrics) top-k precision.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class PerfReport:
    wall_s: float
    steps: int
    edges_updated: float
    rounds: int
    pushes: float
    edge_pushes: float
    n_chips: int = 1
    wl_rounds: int = 0
    scans_cand: int = 0
    scans_fed: int = 0
    scans_liv: int = 0

    @property
    def updates_per_sec(self) -> float:
        return self.edges_updated / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def pushes_per_sec_per_chip(self) -> float:
        if self.wall_s <= 0 or self.n_chips <= 0:
            return 0.0
        return self.edge_pushes / self.wall_s / self.n_chips

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.wall_s if self.wall_s > 0 else 0.0

    def as_dict(self) -> dict:
        return {
            "wall_s": self.wall_s,
            "steps": self.steps,
            "edges_updated": self.edges_updated,
            "rounds": self.rounds,
            "pushes": self.pushes,
            "edge_pushes": self.edge_pushes,
            "n_chips": self.n_chips,
            "wl_rounds": self.wl_rounds,
            "scans_cand": self.scans_cand,
            "scans_fed": self.scans_fed,
            "scans_liv": self.scans_liv,
            "updates_per_sec": self.updates_per_sec,
            "pushes_per_sec_per_chip": self.pushes_per_sec_per_chip,
            "steps_per_sec": self.steps_per_sec,
        }


def summarize(stats_list, wall_s: float, edges_per_step: int, n_chips: int = 1) -> PerfReport:
    """Aggregate per-step PushStats into one report. ``edges_per_step`` is
    insertions+deletions per slide (2b for a full window slide)."""
    rounds = sum(int(s.rounds) for s in stats_list)
    wl_rounds = sum(int(getattr(s, "wl_rounds", 0)) for s in stats_list)
    scans_cand = sum(int(getattr(s, "scans_cand", 0)) for s in stats_list)
    scans_fed = sum(int(getattr(s, "scans_fed", 0)) for s in stats_list)
    scans_liv = sum(int(getattr(s, "scans_liv", 0)) for s in stats_list)
    pushes = sum(float(s.pushes) for s in stats_list)
    edge_pushes = sum(float(s.edge_pushes) for s in stats_list)
    n = len(stats_list)
    return PerfReport(
        wall_s=wall_s,
        steps=n,
        edges_updated=float(n * edges_per_step),
        rounds=rounds,
        pushes=pushes,
        edge_pushes=edge_pushes,
        n_chips=n_chips,
        wl_rounds=wl_rounds,
        scans_cand=scans_cand,
        scans_fed=scans_fed,
        scans_liv=scans_liv,
    )
