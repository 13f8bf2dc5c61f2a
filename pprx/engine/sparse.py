"""Sparse-frontier push path with dense fallback (SURVEY.md §7 phase 4).

A dense round costs O(E*S) regardless of how little residual mass moves;
after a window slide the frontier is tiny (the corrections inject mass only
around the 2b touched endpoints), so the steady-state stream workload is
exactly where frontier sparsity pays. The sparse round costs
O(N*S_scan + F_edges*S) where the N*S term is one elementwise activity scan
of r (bandwidth-bound read) and F_edges is the frontier's snapshot row mass.

Round structure (forward; reverse swaps gather/scatter endpoints and
factors 1/d_out(u) out of the collective sum — see pprx/dist/sharded.py
for the same trick):

1. activity scan: act = |r| > threshold, any-source reduce, compaction
2. overflow test: frontier snapshot-row edges > ecap -> dense fallback
   (lax.cond; both branches exact, so the switch is pure performance)
3. frontier-restricted state update: p/r rows touched via fidx gathers
4. edge-balanced expansion over the CSR snapshot (pprx.engine.frontier)
5. signed overlay sweep (edges changed since snapshot)
6. one scatter-add of contributions into r

Exactness: sparse round == dense round to FP round-off on every state
(tested in tests/test_sparse.py, including snapshot-stale configurations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from pprx.config import PprConfig
from pprx.engine.frontier import CsrSnapshot, Overlay, build_snapshot, compact_frontier, expand
from pprx.engine.push import push_round_given_act, _active_mask
from pprx.engine.state import FORWARD, PprState, PushStats
from pprx.graph.dynamic import WindowGraph


@struct.dataclass
class HybridGraph:
    """COO window + CSR snapshot + signed overlay (SURVEY.md §2.1 L0)."""

    window: WindowGraph
    snap: CsrSnapshot
    ov: Overlay

    @property
    def n(self) -> int:
        return self.window.n

    @classmethod
    def build(cls, window: WindowGraph, mode: int, overlay_cap: int) -> "HybridGraph":
        key = window.src if mode == FORWARD else window.dst
        other = window.dst if mode == FORWARD else window.src
        snap = build_snapshot(key, other, window.n)
        return cls(window=window, snap=snap, ov=Overlay.empty(overlay_cap, window.n))


def rebuild_snapshot(graph: HybridGraph, mode: int) -> HybridGraph:
    """Re-sort the live window into a fresh snapshot; clear the overlay."""
    w = graph.window
    key = w.src if mode == FORWARD else w.dst
    other = w.dst if mode == FORWARD else w.src
    snap = build_snapshot(key, other, w.n)
    cap = graph.ov.src.shape[0]
    return graph.replace(snap=snap, ov=Overlay.empty(cap, w.n))


def sparse_round(
    state: PprState, graph: HybridGraph, cfg: PprConfig, fcap: int, ecap: int
) -> tuple[PprState, jnp.ndarray, jnp.ndarray]:
    """One frontier-sparse push round (caller guarantees no overflow; use
    ``adaptive_round`` for the guarded version)."""
    act = _active_mask(state, graph.window, cfg)
    return sparse_round_given_act(state, act, graph, cfg, fcap, ecap)


def sparse_round_given_act(
    state: PprState, act: jnp.ndarray, graph: HybridGraph, cfg: PprConfig, fcap: int, ecap: int
) -> tuple[PprState, jnp.ndarray, jnp.ndarray]:
    dtype = state.r.dtype
    alpha = jnp.asarray(cfg.alpha, dtype)
    n = graph.n
    deg = graph.window.deg
    act_any = jnp.any(act, axis=1)
    fidx = compact_frontier(act_any, fcap, n)

    r_orig = state.r
    dangling = deg == 0
    inv_deg = 1.0 / jnp.maximum(deg, 1).astype(dtype)

    # frontier-restricted reserve absorption + residual removal
    act_f = act[fidx]
    mass_f = jnp.where(act_f, r_orig[fidx], jnp.zeros((), dtype))
    dang_f = dangling[fidx][:, None]
    p = state.p.at[fidx].add(jnp.where(dang_f, mass_f, alpha * mass_f))
    r = state.r.at[fidx].add(-mass_f)

    if state.mode == FORWARD:
        moving_f = (1.0 - alpha) * mass_f * inv_deg[fidx][:, None]
    else:
        beta = (1.0 - alpha) / alpha
        moving_f = jnp.where(dang_f, beta * mass_f, (1.0 - alpha) * mass_f)

    # snapshot expansion
    t, nbr, valid, _ = expand(fidx, graph.snap, ecap)
    contrib = moving_f[t] * valid.astype(dtype)[:, None]
    delta = jnp.zeros_like(r).at[nbr].add(contrib)

    # signed overlay sweep (gather at the mode's gather endpoint)
    ov = graph.ov
    gat = ov.src if state.mode == FORWARD else ov.dst
    sca = ov.dst if state.mode == FORWARD else ov.src
    mass_ov = jnp.where(act[gat], r_orig[gat], jnp.zeros((), dtype))
    if state.mode == FORWARD:
        mov_ov = (1.0 - alpha) * mass_ov * inv_deg[gat][:, None]
    else:
        beta = (1.0 - alpha) / alpha
        mov_ov = jnp.where(
            dangling[gat][:, None], beta * mass_ov, (1.0 - alpha) * mass_ov
        )
    delta = delta.at[sca].add(mov_ov * ov.sign.astype(dtype)[:, None])

    if state.mode == FORWARD:
        r = r + delta
    else:
        r = r + delta * inv_deg[:, None]

    p = p.at[-1].set(0.0)
    r = r.at[-1].set(0.0)
    n_active = jnp.sum(act, dtype=jnp.float32)
    edge_work = jnp.sum(
        act * graph.snap.row_len[:, None], dtype=jnp.float32
    )
    return state.replace(p=p, r=r), n_active, edge_work


def frontier_edge_count(
    state: PprState, graph: HybridGraph, cfg: PprConfig, fcap: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(#active pairs, #snapshot edges in any-source frontier rows)."""
    act = _active_mask(state, graph.window, cfg)
    act_any = jnp.any(act, axis=1)
    total = jnp.sum(
        jnp.where(act_any[: graph.n], graph.snap.row_len[: graph.n], 0),
        dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32,
    )
    n_active = jnp.sum(act, dtype=jnp.float32)
    return n_active, total


def adaptive_round(
    state: PprState, graph: HybridGraph, cfg: PprConfig, fcap: int, ecap: int
) -> tuple[PprState, jnp.ndarray, jnp.ndarray]:
    """Sparse round when the frontier fits (and is worth it), dense otherwise.

    The dense fallback also covers frontier-vertex overflow (> fcap): the
    edge test subsumes it in practice, but we guard both explicitly."""
    act = _active_mask(state, graph.window, cfg)
    act_any = jnp.any(act, axis=1)
    n_front = jnp.sum(act_any[: graph.n], dtype=jnp.int32)
    fedges = jnp.sum(
        jnp.where(act_any[: graph.n], graph.snap.row_len[: graph.n], 0),
        dtype=jnp.int32,
    )
    ov_n = graph.ov.src.shape[0]
    fits = jnp.logical_and(n_front <= fcap, fedges + ov_n <= ecap)
    # worth it: frontier edge work (+overlay) below half the dense edge work
    worth = (fedges + ov_n) * 2 <= graph.window.capacity
    use_sparse = jnp.logical_and(fits, worth)

    def sp(st, act_):
        return sparse_round_given_act(st, act_, graph, cfg, fcap, ecap)

    def dn(st, act_):
        return push_round_given_act(st, act_, graph.window, cfg)

    return jax.lax.cond(use_sparse, sp, dn, state, act)


def push_to_convergence_hybrid(
    state: PprState, graph: HybridGraph, cfg: PprConfig, fcap: int, ecap: int
) -> tuple[PprState, PushStats]:
    """On-device convergence loop with per-round dense/sparse switching."""

    def cond(c):
        _, stats, n_active = c
        return jnp.logical_and(n_active > 0, stats.rounds < cfg.max_rounds)

    def body(c):
        st, stats, _ = c
        st2, na, ep = adaptive_round(st, graph, cfg, fcap, ecap)
        return (
            st2,
            PushStats(
                rounds=stats.rounds + 1,
                pushes=stats.pushes + na,
                edge_pushes=stats.edge_pushes + ep,
            ),
            na,
        )

    n0 = jnp.sum(_active_mask(state, graph.window, cfg), dtype=jnp.float32)
    state, stats, _ = jax.lax.while_loop(cond, body, (state, PushStats.zero(), n0))
    return state, stats
