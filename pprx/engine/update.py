"""Batched dynamic-update engine: vectorized invariant-exact corrections.

Reference counterpart (SURVEY.md §2.1 "Batch update engine", §2.3, §3.2):
per-edge O(1) endpoint corrections, batched. The per-edge rules live in
pprx/ref/push.py (derived from the invariant; property-tested). This module
applies a whole insert/delete batch in closed form — the telescoped result
of applying the per-edge rule sequentially, which for k same-source edges
collapses to ONE per-vertex term plus a uniform per-edge term:

forward mode, beta = (1-alpha)/alpha, per source-vertex u with old degree d,
k edges deleted then (with p', d' the post-delete values) k' inserted:

  delete batch:  per edge (u,w):  r[w] -= beta * p[u]/d
                 D = d-k >= 1:    p[u] *= D/d;   r[u] += k*p[u]/(alpha*d)
                 D == 0:          p[u] *= 1/d;   r[u] += (k-alpha)*p[u]/(alpha*d)
  insert batch:  per edge (u,w):  r[w] += beta * p'[u]/max(d',1)
                 d' >= 1:         p'[u] *= (d'+k')/d'; r[u] -= k'*p'[u]/(alpha*d')
                 d' == 0, k'>=1:  p'[u] *= k';         r[u] -= (k'-alpha)*p'[u]/alpha

reverse mode (p unchanged; needs row means of p — SURVEY.md §2.3 batched
segment-sum form):

  r[u] += beta * ((P'p)(u) - (Pp)(u))
  (Pp)(u) = mean of p over u's out-row, or p(u) if u is dangling.

Batches are phantom-padded (u = w = N) to keep shapes static; phantom
entries are exact no-ops because p[N] = 0.

Equality guarantee (tested): batched apply == sequential per-edge oracle
applying all deletes then all inserts, to FP round-off.
"""

from __future__ import annotations

import jax.numpy as jnp

from pprx.config import PprConfig
from pprx.engine.state import FORWARD, PprState
from pprx.graph.dynamic import WindowGraph


def _counts(idx: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    return jnp.zeros(n_rows, jnp.int32).at[idx].add(1)


def apply_edge_batch(
    state: PprState,
    graph: WindowGraph,
    ins_src: jnp.ndarray,
    ins_dst: jnp.ndarray,
    del_src: jnp.ndarray,
    del_dst: jnp.ndarray,
    cfg: PprConfig,
) -> tuple[PprState, WindowGraph]:
    """Apply one batch of edge deletions then insertions.

    Mutates only ``state.p/r`` and ``graph.deg`` (the COO buffer itself is
    rewritten by the stream driver — reverse-mode corrections need the OLD
    buffer, so call this BEFORE overwriting expiring slots). Deletion
    batches must be valid: every (u,w) currently in the graph, with
    multiplicity.
    """
    dtype = state.r.dtype
    n_rows = state.p.shape[0]
    alpha = jnp.asarray(cfg.alpha, dtype)
    beta = (1.0 - alpha) / alpha
    d0 = graph.deg
    k_del = _counts(del_src, n_rows)
    k_ins = _counts(ins_src, n_rows)

    if state.mode == FORWARD:
        p, r = state.p, state.r
        # ---- delete phase (old p, old degrees) ----
        d0f = jnp.maximum(d0, 1).astype(dtype)
        per_edge = beta * p[del_src] / d0f[del_src, None]  # [B,S]
        r = r.at[del_dst].add(-per_edge)
        D = d0 - k_del
        touched = k_del > 0
        full = jnp.logical_and(touched, D == 0)
        scale_p = jnp.where(
            touched, jnp.where(D >= 1, D, 1).astype(dtype) / d0f, jnp.ones((), dtype)
        )
        num = jnp.where(full, k_del.astype(dtype) - alpha, k_del.astype(dtype))
        r_add = jnp.where(touched, num / (alpha * d0f), jnp.zeros((), dtype))
        r = r + r_add[:, None] * p
        p = p * scale_p[:, None]

        # ---- insert phase (post-delete p, post-delete degrees) ----
        d1 = D
        d1f = jnp.maximum(d1, 1).astype(dtype)
        per_edge = beta * p[ins_src] / d1f[ins_src, None]
        r = r.at[ins_dst].add(per_edge)
        touched = k_ins > 0
        from_dangling = jnp.logical_and(touched, d1 == 0)
        scale_p = jnp.where(
            touched,
            jnp.where(
                from_dangling,
                k_ins.astype(dtype),
                (d1 + k_ins).astype(dtype) / d1f,
            ),
            jnp.ones((), dtype),
        )
        num = jnp.where(from_dangling, k_ins.astype(dtype) - alpha, k_ins.astype(dtype))
        denom = jnp.where(from_dangling, alpha, alpha * d1f)
        r_sub = jnp.where(touched, num / denom, jnp.zeros((), dtype))
        r = r - r_sub[:, None] * p
        p = p * scale_p[:, None]
    else:
        # ---- reverse mode: r[u] += beta * ((P'p)(u) - (Pp)(u)) ----
        p, r = state.p, state.r
        rowsum = jnp.zeros_like(p).at[graph.src].add(p[graph.dst])  # old out-rows
        d0f = jnp.maximum(d0, 1).astype(dtype)
        pp_old = jnp.where((d0 == 0)[:, None], p, rowsum / d0f[:, None])
        # pp_new - pp_old is nonzero ONLY at rows whose out-edges changed, so
        # s_new is rowsum plus 2 batch-sized scatters (not 2 more full sweeps)
        s_new = rowsum.at[del_src].add(-p[del_dst]).at[ins_src].add(p[ins_dst])
        d_new = d0 - k_del + k_ins
        d_newf = jnp.maximum(d_new, 1).astype(dtype)
        pp_new = jnp.where((d_new == 0)[:, None], p, s_new / d_newf[:, None])
        r = r + beta * (pp_new - pp_old)

    deg_new = (d0 - k_del + k_ins).at[-1].set(0)  # phantom row degree pinned
    p = p.at[-1].set(0.0)
    r = r.at[-1].set(0.0)
    return state.replace(p=p, r=r), graph.replace(deg=deg_new)
