"""Sliding-window stream driver end-to-end (SURVEY.md §4 reference-parity):
dynamically maintained state after K slides must match a from-scratch static
run on the final window — the reference paper's own validation methodology.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.config import PprConfig, StreamConfig
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, REVERSE, init_state
from pprx.graph.dynamic import WindowGraph
from pprx.graph.io import synthetic_powerlaw_stream
from pprx.graph.stream import StreamDriver
from pprx.ref.exact import exact_ppr_matrix

ALPHA = 0.15
CFG = PprConfig(alpha=ALPHA, eps=1e-8, max_rounds=10_000)


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
def test_stream_matches_static_recompute(mode):
    n, total = 30, 400
    src, dst, _ = synthetic_powerlaw_stream(n, total, seed=5)
    scfg = StreamConfig(window=200, slide=16)
    queries = [0, 4, 9]
    drv = StreamDriver(src, dst, n, queries, CFG, scfg, mode=mode, dtype=jnp.float64)
    drv.seed()
    steps = list(drv.run())
    assert len(steps) == (total - 200) // 16
    assert all(int(s.rounds) >= 0 for s in steps)

    # final window contents
    lo = drv.head - scfg.window
    fs, fd = src[lo : drv.head], dst[lo : drv.head]
    # graph buffer must hold exactly the final window's multiset of edges
    gs, gd = drv.graph.coo_numpy()
    assert sorted(zip(gs.tolist(), gd.tolist())) == sorted(zip(fs.tolist(), fd.tolist()))

    M = exact_ppr_matrix(fs, fd, n, ALPHA)
    p = np.asarray(drv.state.p)[:n]
    for j, q in enumerate(queries):
        tgt = M[q] if mode == FORWARD else M[:, q]
        assert np.abs(p[:, j] - tgt).max() < CFG.eps * n, f"query {q}"

    # and the maintained state equals a fresh static run to the same bound
    g2 = WindowGraph.from_coo(fs, fd, n)
    st2 = init_state(n, queries, mode=mode, dtype=jnp.float64)
    st2, _ = push_to_convergence(st2, g2, CFG)
    np.testing.assert_allclose(
        p, np.asarray(st2.p)[:n], atol=2 * CFG.eps * n
    )


def test_stream_degrees_stay_exact():
    n, total = 25, 300
    src, dst, _ = synthetic_powerlaw_stream(n, total, seed=9)
    scfg = StreamConfig(window=128, slide=32)
    drv = StreamDriver(src, dst, n, [1], CFG, scfg, dtype=jnp.float64)
    drv.seed()
    for _ in drv.run():
        pass
    lo = drv.head - scfg.window
    expect = np.bincount(src[lo : drv.head], minlength=n + 1).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(drv.graph.deg), expect)
