"""Sparse-frontier path vs dense path: exact equality per round and at
convergence, including stale-snapshot configurations (SURVEY.md §4 "Kernel"
tier: all implementations of one push round must agree)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.config import PprConfig
from pprx.engine.frontier import Overlay
from pprx.engine.push import push_round, push_to_convergence
from pprx.engine.sparse import (
    HybridGraph,
    push_to_convergence_hybrid,
    rebuild_snapshot,
    sparse_round,
)
from pprx.engine.state import FORWARD, REVERSE, init_state
from pprx.graph.dynamic import WindowGraph
from tests.conftest import random_multigraph

ALPHA = 0.2
CFG = PprConfig(alpha=ALPHA, eps=1e-7, max_rounds=10_000)


def mid_push_state(graph, n, queries, mode, rounds=3):
    state = init_state(n, queries, mode=mode, dtype=jnp.float64)
    for _ in range(rounds):
        state, _, _ = push_round(state, graph, CFG)
    return state


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sparse_round_equals_dense_round(mode, seed):
    rng = np.random.default_rng(seed)
    n, m = 30, 150
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n, capacity=m + 10)
    hybrid = HybridGraph.build(graph, mode, overlay_cap=16)
    state = mid_push_state(graph, n, [0, 5, 9], mode)

    dense_state, na_d, _ = push_round(state, graph, CFG)
    sparse_state, na_s, _ = sparse_round(state, hybrid, CFG, fcap=n + 1, ecap=m + 30)

    assert float(na_d) == float(na_s)
    np.testing.assert_allclose(
        np.asarray(sparse_state.p), np.asarray(dense_state.p), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(sparse_state.r), np.asarray(dense_state.r), atol=1e-14
    )


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
def test_sparse_round_with_stale_snapshot(mode):
    """Snapshot built BEFORE edge churn; overlay carries the diff. The
    sparse round over (stale snapshot + overlay) must equal the dense round
    over the live window."""
    rng = np.random.default_rng(3)
    n, m = 25, 120
    src, dst = random_multigraph(rng, n, m)
    cap = m + 8
    graph0 = WindowGraph.from_coo(src, dst, n, capacity=cap)
    hybrid = HybridGraph.build(graph0, mode, overlay_cap=32)

    # churn: expire 6 edges (slots 0..5), insert 6 new ones in their slots
    new_src = ((src[:6] + 3) % n).astype(np.int32)
    new_dst = ((dst[:6] + 5) % n).astype(np.int32)
    ov_src = np.full(32, n, np.int32)
    ov_dst = np.full(32, n, np.int32)
    ov_sign = np.zeros(32, np.int32)
    ov_src[:6], ov_dst[:6], ov_sign[:6] = src[:6], dst[:6], -1
    ov_src[6:12], ov_dst[6:12], ov_sign[6:12] = new_src, new_dst, 1

    live_src = np.concatenate([new_src, src[6:].astype(np.int32), np.full(cap - m, n, np.int32)])
    live_dst = np.concatenate([new_dst, dst[6:].astype(np.int32), np.full(cap - m, n, np.int32)])
    deg = np.bincount(live_src[live_src != n], minlength=n + 1).astype(np.int32)
    live = WindowGraph(
        src=jnp.asarray(live_src), dst=jnp.asarray(live_dst), deg=jnp.asarray(deg)
    )
    hybrid = hybrid.replace(
        window=live,
        ov=Overlay(src=jnp.asarray(ov_src), dst=jnp.asarray(ov_dst), sign=jnp.asarray(ov_sign)),
    )

    state = mid_push_state(live, n, [2, 7], mode)
    dense_state, na_d, _ = push_round(state, live, CFG)
    sparse_state, na_s, _ = sparse_round(state, hybrid, CFG, fcap=n + 1, ecap=cap + 40)
    assert float(na_d) == float(na_s)
    np.testing.assert_allclose(
        np.asarray(sparse_state.r), np.asarray(dense_state.r), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(sparse_state.p), np.asarray(dense_state.p), atol=1e-14
    )

    # after a rebuild the overlay is folded into the snapshot; same answer
    hybrid2 = rebuild_snapshot(hybrid, mode)
    assert int(jnp.sum(jnp.abs(hybrid2.ov.sign))) == 0
    sparse2, na2, _ = sparse_round(state, hybrid2, CFG, fcap=n + 1, ecap=cap + 40)
    np.testing.assert_allclose(
        np.asarray(sparse2.r), np.asarray(dense_state.r), atol=1e-14
    )


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
def test_hybrid_convergence_matches_dense(mode):
    rng = np.random.default_rng(5)
    n, m = 40, 220
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n)
    hybrid = HybridGraph.build(graph, mode, overlay_cap=8)
    queries = [0, 11, 22]

    s1 = init_state(n, queries, mode=mode, dtype=jnp.float64)
    s1, stats1 = push_to_convergence(s1, graph, CFG)
    s2 = init_state(n, queries, mode=mode, dtype=jnp.float64)
    s2, stats2 = push_to_convergence_hybrid(s2, hybrid, CFG, fcap=n + 1, ecap=m + 20)

    np.testing.assert_allclose(np.asarray(s2.p), np.asarray(s1.p), atol=1e-13)
    np.testing.assert_allclose(np.asarray(s2.r), np.asarray(s1.r), atol=1e-13)
    assert int(stats2.rounds) == int(stats1.rounds)


def test_adaptive_falls_back_on_tiny_ecap():
    """With ecap too small for the frontier, the adaptive round must still
    produce the dense-round answer (fallback, not corruption)."""
    rng = np.random.default_rng(6)
    n, m = 20, 100
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n)
    hybrid = HybridGraph.build(graph, FORWARD, overlay_cap=4)
    state = init_state(n, [0], mode=FORWARD, dtype=jnp.float64)
    from pprx.engine.sparse import adaptive_round

    dense_state, _, _ = push_round(state, graph, CFG)
    ad_state, _, _ = adaptive_round(state, hybrid, CFG, fcap=n + 1, ecap=2)
    np.testing.assert_allclose(
        np.asarray(ad_state.r), np.asarray(dense_state.r), atol=1e-15
    )
