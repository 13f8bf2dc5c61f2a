"""JAX dense engine vs the sequential oracle (SURVEY.md §4 "Oracle" tier).

The engine processes *rounds* (all active pairs at once) while the oracle
pushes vertices one at a time — the resulting (p, r) states differ, but both
must satisfy the invariant exactly and both converge to within the same
error bound of exact PPR. The batched-update tests DO check exact state
equality, because batched closed forms are defined as the telescoped
sequential application.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.config import PprConfig
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, REVERSE, init_state
from pprx.engine.update import apply_edge_batch
from pprx.graph.dynamic import WindowGraph
from pprx.ref.exact import exact_ppr_matrix
from pprx.ref.push import OracleGraph, PushState, apply_edge_event
from tests.conftest import random_multigraph

ALPHA = 0.2
CFG = PprConfig(alpha=ALPHA, eps=1e-7, max_rounds=10_000)


def engine_invariant_check(state, src, dst, n, queries, mode, atol=1e-10):
    M = exact_ppr_matrix(src, dst, n, ALPHA)
    p = np.asarray(state.p)[:n]
    r = np.asarray(state.r)[:n]
    for j, q in enumerate(queries):
        if mode == FORWARD:
            lhs, rhs = p[:, j] + r[:, j] @ M, M[q]
        else:
            lhs, rhs = p[:, j] + M @ r[:, j], M[:, q]
        np.testing.assert_allclose(lhs, rhs, atol=atol)


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize("seed", [0, 1])
def test_engine_matches_exact_and_invariant(mode, seed):
    rng = np.random.default_rng(seed)
    n, m = 25, 120
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n)
    queries = [0, 3, 7, 7, 24]  # duplicate query exercises batching
    state = init_state(n, queries, mode=mode, dtype=jnp.float64)
    state, stats = push_to_convergence(state, graph, CFG)
    assert int(stats.rounds) > 0
    assert float(stats.pushes) > 0
    engine_invariant_check(state, src, dst, n, queries, mode)
    # converged: residuals below threshold, p close to exact
    M = exact_ppr_matrix(src, dst, n, ALPHA)
    p = np.asarray(state.p)[:n]
    for j, q in enumerate(queries):
        tgt = M[q] if mode == FORWARD else M[:, q]
        assert np.abs(p[:, j] - tgt).max() < CFG.eps * n


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
def test_engine_matches_oracle_accuracy(mode):
    """Engine p and oracle p agree to the push-bound scale."""
    rng = np.random.default_rng(3)
    n, m = 20, 80
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n)
    q = 5
    state = init_state(n, [q], mode=mode, dtype=jnp.float64)
    state, _ = push_to_convergence(state, graph, CFG)
    g = OracleGraph(n, src, dst)
    st = PushState.init(n, q, "forward" if mode == FORWARD else "reverse")
    from pprx.ref.push import forward_push, reverse_push

    (forward_push if mode == FORWARD else reverse_push)(g, st, ALPHA, CFG.eps)
    np.testing.assert_allclose(
        np.asarray(state.p)[:n, 0], st.p, atol=2 * CFG.eps * n
    )


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_update_equals_sequential_oracle(mode, seed):
    """Batched closed-form corrections == per-edge sequential application."""
    rng = np.random.default_rng(seed)
    n, m = 15, 50
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n, capacity=m + 8)
    q = 2
    state = init_state(n, [q], mode=mode, dtype=jnp.float64)
    state, _ = push_to_convergence(state, graph, CFG)

    # choose deletions (valid, with multiplicity) and insertions
    del_idx = rng.choice(m, size=6, replace=False)
    dels = [(int(src[i]), int(dst[i])) for i in del_idx]
    ins = []
    for _ in range(7):
        u = int(rng.integers(n))
        w = (u + 1 + int(rng.integers(n - 1))) % n
        ins.append((u, w))
    # exercise dangling transitions: delete ALL edges of some vertex
    u_all = int(src[0])
    for i in range(m):
        if int(src[i]) == u_all and (int(src[i]), int(dst[i])) not in dels:
            dels.append((int(src[i]), int(dst[i])))

    # oracle: sequential deletes then inserts
    g = OracleGraph(n, src, dst)
    st = PushState.init(n, q, "forward" if mode == FORWARD else "reverse")
    st.p = np.asarray(state.p)[:n, 0].copy()
    st.r = np.asarray(state.r)[:n, 0].copy()
    for u, w in dels:
        apply_edge_event(g, st, u, w, insert=False, alpha=ALPHA)
    for u, w in ins:
        apply_edge_event(g, st, u, w, insert=True, alpha=ALPHA)

    # engine: one batched call (phantom-padded)
    pad = n  # phantom
    B = 16
    ds = np.full(B, pad, np.int32)
    dd = np.full(B, pad, np.int32)
    for i, (u, w) in enumerate(dels):
        ds[i], dd[i] = u, w
    is_, id_ = np.full(B, pad, np.int32), np.full(B, pad, np.int32)
    for i, (u, w) in enumerate(ins):
        is_[i], id_[i] = u, w
    state2, graph2 = apply_edge_batch(
        state, graph, jnp.asarray(is_), jnp.asarray(id_), jnp.asarray(ds), jnp.asarray(dd), CFG
    )

    np.testing.assert_allclose(np.asarray(state2.p)[:n, 0], st.p, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state2.r)[:n, 0], st.r, atol=1e-12)
    # degrees maintained exactly
    deg_expect = np.zeros(n + 1, np.int32)
    for u in range(n):
        deg_expect[u] = len(g.out[u])
    np.testing.assert_array_equal(np.asarray(graph2.deg), deg_expect)


def test_signed_residual_convergence():
    """Deletions drive residuals negative; push must still converge and the
    result must match exact PPR on the post-deletion graph."""
    rng = np.random.default_rng(11)
    n, m = 18, 70
    src, dst = random_multigraph(rng, n, m)
    graph = WindowGraph.from_coo(src, dst, n, capacity=m)
    state = init_state(n, [1], mode=FORWARD, dtype=jnp.float64)
    state, _ = push_to_convergence(state, graph, CFG)
    # delete a third of the edges
    kill = rng.choice(m, size=m // 3, replace=False)
    keep = np.setdiff1d(np.arange(m), kill)
    B = kill.shape[0]
    state, graph = apply_edge_batch(
        state,
        graph,
        jnp.full(B, n, jnp.int32),
        jnp.full(B, n, jnp.int32),
        jnp.asarray(src[kill], jnp.int32),
        jnp.asarray(dst[kill], jnp.int32),
        CFG,
    )
    assert float(jnp.min(state.r)) < 0  # the point of the test
    # rewrite the COO buffer without the killed edges (phantom-pad the rest)
    new_src = np.full(m, n, np.int32)
    new_dst = np.full(m, n, np.int32)
    new_src[: keep.size] = src[keep]
    new_dst[: keep.size] = dst[keep]
    graph = graph.replace(src=jnp.asarray(new_src), dst=jnp.asarray(new_dst))
    state, _ = push_to_convergence(state, graph, CFG)
    M = exact_ppr_matrix(src[keep], dst[keep], n, ALPHA)
    np.testing.assert_allclose(
        np.asarray(state.p)[:n, 0], M[1], atol=CFG.eps * n
    )
