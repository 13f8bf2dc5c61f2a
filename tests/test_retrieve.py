"""Retrieval head + metrics ([BASELINE] config 4 shape, small scale)."""

import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, init_state
from pprx.eval.metrics import l1_error, precision_at_k
from pprx.graph.dynamic import WindowGraph
from pprx.graph.io import synthetic_powerlaw_stream
from pprx.ref.exact import exact_ppr
from pprx.retrieve import retrieve

ALPHA = 0.15
CFG = PprConfig(alpha=ALPHA, eps=1e-9, max_rounds=10_000)


def test_topk_matches_exact_ranking():
    n, m = 120, 900
    src, dst, _ = synthetic_powerlaw_stream(n, m, seed=4)
    graph = WindowGraph.from_coo(src, dst, n)
    queries = [0, 3, 17, 50]
    state = init_state(n, queries, mode=FORWARD, dtype=jnp.float64)
    state, _ = push_to_convergence(state, graph, CFG)
    k = 20
    scores, ids = retrieve(state, k=k)
    assert scores.shape == (len(queries), k) and ids.shape == (len(queries), k)
    for j, q in enumerate(queries):
        pi = exact_ppr(src, dst, n, q, ALPHA)
        prec = precision_at_k(np.asarray(ids[j]), pi, k)
        assert prec == 1.0, f"query {q}: precision@{k} = {prec}"
        # forward-push L1 bound: sum_v |r(v)| <= eps * sum_v d_out(v) = eps*E
        assert l1_error(np.asarray(state.p)[:n, j], pi) < CFG.eps * m
        # scores descending
        s = np.asarray(scores[j])
        assert (np.diff(s) <= 1e-15).all()


def test_precision_at_k_tie_handling():
    exact = np.array([0.5, 0.3, 0.3, 0.1])
    assert precision_at_k(np.array([0, 2]), exact, 2) == 1.0  # tie at boundary
    assert precision_at_k(np.array([0, 3]), exact, 2) == 0.5
