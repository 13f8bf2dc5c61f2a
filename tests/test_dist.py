"""Sharded engine vs single-device engine on the virtual 8-device CPU mesh
(SURVEY.md §4 "Multi-device without a cluster"). The sharded push and slide
must reproduce the single-device results to FP round-off, across both modes
and both mesh factorizations (rows-only and rows x srcs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.config import PprConfig, StreamConfig
from pprx.dist.mesh import make_row_mesh
from pprx.dist.sharded import ShardedEngine
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, REVERSE, init_state
from pprx.graph.dynamic import WindowGraph
from pprx.graph.io import synthetic_powerlaw_stream
from tests.conftest import random_multigraph

ALPHA = 0.15
CFG = PprConfig(alpha=ALPHA, eps=1e-8, max_rounds=10_000)


def single_device_reference(src, dst, n, queries, mode):
    graph = WindowGraph.from_coo(src, dst, n)
    state = init_state(n, queries, mode=mode, dtype=jnp.float64)
    state, stats = push_to_convergence(state, graph, CFG)
    return np.asarray(state.p)[:n], np.asarray(state.r)[:n], stats


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize("rows,srcs", [(8, 1), (4, 2), (2, 4)])
def test_sharded_push_matches_single_device(mode, rows, srcs):
    rng = np.random.default_rng(0)
    n, m = 50, 300
    src, dst = random_multigraph(rng, n, m)
    queries = [0, 7, 13, 25, 31, 44, 7, 2]
    mesh = make_row_mesh(rows, srcs)
    eng = ShardedEngine(
        mesh, n, len(queries), ecap=m, bcap=8, cfg=CFG, mode=mode, dtype=jnp.float64
    )
    p, r = eng.init_state(queries)
    deg, egl, eog, eva, counts = eng.device_graph(src, dst)
    assert counts.sum() == m
    p, r, rounds, pushes, epushes = eng.push(p, r, deg, egl, eog, eva)

    p_ref, r_ref, stats = single_device_reference(src, dst, n, queries, mode)
    np.testing.assert_allclose(np.asarray(p)[:n], p_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r)[:n], r_ref, atol=1e-12)
    assert int(rounds) == int(stats.rounds)
    assert float(pushes) == float(stats.pushes)
    assert float(epushes) == float(stats.edge_pushes)
    # padded tail rows (>= n) stay exactly zero
    assert np.abs(np.asarray(p)[n:]).max() == 0.0


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
def test_sharded_slide_matches_single_device(mode):
    """Full dynamic parity: run the same sliding stream on the sharded and
    the single-device engines; states must agree to round-off."""
    from pprx.dist.stream import ShardedStreamDriver
    from pprx.graph.stream import StreamDriver

    n, total = 40, 500
    src, dst, _ = synthetic_powerlaw_stream(n, total, seed=2)
    scfg = StreamConfig(window=300, slide=25)
    queries = [0, 5, 11, 33]

    sd = StreamDriver(src, dst, n, queries, CFG, scfg, mode=mode, dtype=jnp.float64)
    sd.seed()
    ref_stats = [s for s in sd.run(6)]

    mesh = make_row_mesh(4, 1)
    drv = ShardedStreamDriver(
        src, dst, n, queries, CFG, scfg, mesh, mode=mode, dtype=jnp.float64
    )
    drv.seed()
    stats = [s for s in drv.run(6)]

    assert len(stats) == len(ref_stats) == 6
    for a, b in zip(stats, ref_stats):
        assert int(a["rounds"]) == int(b.rounds)

    p_ref = np.asarray(sd.state.p)[:n]
    r_ref = np.asarray(sd.state.r)[:n]
    np.testing.assert_allclose(drv.host_p()[:n], p_ref, atol=1e-11)
    np.testing.assert_allclose(drv.host_r()[:n], r_ref, atol=1e-11)
    # degrees agree
    lo = drv.head - scfg.window
    expect = np.bincount(src[lo : drv.head], minlength=n).astype(np.int32)
    np.testing.assert_array_equal(drv.host_deg()[:n], expect)


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize("ccap", [1024, 6])  # ccap=6 forces overflow-carry rounds
def test_a2a_exchange_matches_dense_rs(mode, ccap):
    """Bucketed all-to-all frontier exchange vs reduce-scatter vs single
    device. Without overflow (ccap >= N_local) the round schedule and states
    are identical; with a tiny bucket capacity the overflow->carry path
    reorders deliveries (mass waits in the outbox), so the converged state
    is compared against the accuracy bound instead of bitwise."""
    rng = np.random.default_rng(4)
    n, m = 40, 200
    src, dst = random_multigraph(rng, n, m)
    queries = [0, 9, 21, 33]
    mesh = make_row_mesh(4, 1)

    eng_rs = ShardedEngine(mesh, n, len(queries), ecap=m, bcap=8, cfg=CFG, mode=mode, dtype=jnp.float64)
    eng_a2a = ShardedEngine(
        mesh, n, len(queries), ecap=m, bcap=8, cfg=CFG, mode=mode,
        dtype=jnp.float64, exchange="a2a", ccap=ccap,
    )
    p1, r1 = eng_rs.init_state(queries)
    deg, egl, eog, eva, _ = eng_rs.device_graph(src, dst)
    p1, r1, rounds1, pushes1, _ = eng_rs.push(p1, r1, deg, egl, eog, eva)

    p2, r2 = eng_a2a.init_state(queries)
    deg2, egl2, eog2, eva2, _ = eng_a2a.device_graph(src, dst)
    p2, r2, rounds2, pushes2, _ = eng_a2a.push(p2, r2, deg2, egl2, eog2, eva2)

    assert int(rounds2) < CFG.max_rounds, "a2a failed to converge"
    if ccap >= eng_a2a.n_local:  # no overflow: identical schedule and state
        assert int(rounds2) == int(rounds1)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-12)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-12)
    else:  # overflow: extra delivery rounds; state converged to the bound
        assert int(rounds2) > int(rounds1)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=m * CFG.eps)
    p_ref, r_ref, _ = single_device_reference(src, dst, n, queries, mode)
    np.testing.assert_allclose(np.asarray(p2)[:n], p_ref, atol=m * CFG.eps)
