"""Hybrid (sparse) stream driver == dense stream driver, including across
snapshot rebuilds."""

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.config import PprConfig, StreamConfig
from pprx.engine.state import FORWARD, REVERSE
from pprx.graph.hybrid_stream import HybridStreamDriver
from pprx.graph.io import synthetic_powerlaw_stream
from pprx.graph.stream import StreamDriver

CFG = PprConfig(alpha=0.15, eps=1e-8)


@pytest.mark.parametrize("mode", [FORWARD, REVERSE])
@pytest.mark.parametrize("worklist", [True, False])
def test_hybrid_stream_matches_dense_stream(mode, worklist):
    n, total = 35, 500
    src, dst, _ = synthetic_powerlaw_stream(n, total, seed=11)
    scfg = StreamConfig(window=250, slide=25)
    queries = [0, 6, 17]

    a = StreamDriver(src, dst, n, queries, CFG, scfg, mode=mode, dtype=jnp.float64)
    a.seed()
    ra = [int(s.rounds) for s in a.run(10)]

    # rebuild_every=3 forces multiple snapshot rebuilds within 10 steps
    b = HybridStreamDriver(
        src, dst, n, queries, CFG, scfg, mode=mode, dtype=jnp.float64,
        rebuild_every=3, worklist=worklist,
    )
    b.seed()
    rb = [int(s.rounds) for s in b.run(10)]

    assert ra == rb
    np.testing.assert_allclose(
        np.asarray(b.state.p), np.asarray(a.state.p), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(b.state.r), np.asarray(a.state.r), atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(b.graph.window.deg), np.asarray(a.graph.deg)
    )
