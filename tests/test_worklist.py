"""Worklist engine unit tests: capacity overflows must fall back to scan
rounds without corrupting state (SURVEY.md §4 property tier)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.config import PprConfig
from pprx.engine.push import push_to_convergence
from pprx.engine.sparse import (
    HybridGraph,
    _dedup_compact,
    push_to_convergence_worklist,
)
from pprx.engine.state import FORWARD, REVERSE, init_state
from pprx.graph.dynamic import WindowGraph
from tests.conftest import random_multigraph

CFG = PprConfig(alpha=0.2, eps=1e-8, max_rounds=10_000)


def reference(src, dst, n, queries, mode):
    graph = WindowGraph.from_coo(src, dst, n)
    st = init_state(n, queries, mode=mode, dtype=jnp.float64)
    st, stats = push_to_convergence(st, graph, CFG)
    return np.asarray(st.p), np.asarray(st.r), int(stats.rounds)


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize(
    "wcap,ecap,ovacap",
    [
        (64, 512, 16),   # comfortable: all rounds worklist after the seed scan
        (8, 512, 16),    # candidate overflow every round -> scans
        (64, 8, 16),     # expansion overflow -> scans
        (64, 512, 1),    # overlay-live overflow (no overlay edges here: no-op)
    ],
)
def test_worklist_convergence_matches_dense(mode, wcap, ecap, ovacap):
    rng = np.random.default_rng(7)
    n, m = 40, 200
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n)
    hybrid = HybridGraph.build(graph, mode, overlay_cap=8)
    queries = [0, 13, 26]
    st = init_state(n, queries, mode=mode, dtype=jnp.float64)
    cand0 = jnp.full(wcap, n, jnp.int32)
    st, stats = push_to_convergence_worklist(
        st, hybrid, CFG, cand0, False, ((wcap, ecap, ovacap),), n + 1, m + 20
    )
    p_ref, r_ref, rounds_ref = reference(src, dst, n, queries, mode)
    np.testing.assert_allclose(np.asarray(st.p), p_ref, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.r), r_ref, atol=1e-13)
    assert int(stats.rounds) == rounds_ref  # same schedule regardless of path
    assert int(stats.wl_rounds) <= int(stats.rounds)


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize(
    "tiers",
    [
        ((8, 512, 16), (64, 512, 16)),            # advisor round-1 repro
        ((8, 64, 16), (24, 512, 16), (64, 512, 16)),
    ],
)
def test_multitier_overflow_does_not_drop_candidates(mode, tiers):
    """A round run at a small tier can mark MORE next-frontier rows than that
    tier's own wcap; the truncated candidate list must be invalidated against
    the tier actually used (round-1 advisor high finding: checking against
    the largest tier's wcap silently dropped rows in (w_i, wcap] and the loop
    'converged' with unpushed residual above the eps bound).

    Star graph: pushing the hub activates n-1 leaves at once, outgrowing the
    small tier from a 1-row frontier."""
    n = 30
    hub = 0
    # hub -> every leaf, and every leaf -> hub (so reverse mode pushes too)
    src = np.array([hub] * (n - 1) + list(range(1, n)), dtype=np.int64)
    dst = np.array(list(range(1, n)) + [hub] * (n - 1), dtype=np.int64)
    graph = WindowGraph.from_coo(src, dst, n)
    hybrid = HybridGraph.build(graph, mode, overlay_cap=8)
    queries = [hub, 5]
    st = init_state(n, queries, mode=mode, dtype=jnp.float64)
    wcap = tiers[-1][0]
    cand0, c0n = _dedup_compact(jnp.asarray(queries, jnp.int32), wcap, n)
    st, stats = push_to_convergence_worklist(
        st, hybrid, CFG, cand0, True, tiers, n + 1, len(src) + 20
    )
    p_ref, r_ref, _ = reference(src, dst, n, queries, mode)
    np.testing.assert_allclose(np.asarray(st.p), p_ref, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.r), r_ref, atol=1e-13)
    # and convergence really means converged: every residual below threshold
    deg = np.bincount(src, minlength=n)
    thresh = CFG.eps * np.maximum(deg, 1) if mode == FORWARD else CFG.eps
    assert (np.abs(np.asarray(st.r)[:n]) <= np.asarray(thresh).reshape(-1, 1) if mode == FORWARD
            else (np.abs(np.asarray(st.r)[:n]) <= CFG.eps)).all()


def test_worklist_seeded_candidates_cover_frontier():
    """Seeding candidates with exactly the rows holding residual must run
    pure worklist rounds (no scans) and still match the dense engine."""
    rng = np.random.default_rng(9)
    n, m = 30, 150
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n)
    hybrid = HybridGraph.build(graph, FORWARD, overlay_cap=8)
    queries = [3, 17]
    st = init_state(n, queries, mode=FORWARD, dtype=jnp.float64)
    wcap = n + 1
    cand0, c0n = _dedup_compact(jnp.asarray([3, 17], jnp.int32), wcap, n)
    st, stats = push_to_convergence_worklist(
        st, hybrid, CFG, cand0, True, ((wcap, m + 30, 8),), n + 1, m + 30
    )
    p_ref, _, rounds_ref = reference(src, dst, n, queries, FORWARD)
    np.testing.assert_allclose(np.asarray(st.p), p_ref, atol=1e-13)
    assert int(stats.wl_rounds) == int(stats.rounds) == rounds_ref
