"""Checkpoint/resume: a resumed stream must produce bit-identical states to
an uninterrupted run (SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig, StreamConfig
from pprx.graph.io import synthetic_powerlaw_stream
from pprx.graph.stream import StreamDriver
from pprx.io.checkpoint import load_checkpoint, save_checkpoint

CFG = PprConfig(alpha=0.15, eps=1e-7)


def test_checkpoint_resume_bit_identical(tmp_path):
    n, total = 30, 400
    src, dst, _ = synthetic_powerlaw_stream(n, total, seed=8)
    scfg = StreamConfig(window=200, slide=20)

    a = StreamDriver(src, dst, n, [0, 5], CFG, scfg, dtype=jnp.float64)
    a.seed()
    for _ in a.run(4):
        pass
    ckpt = str(tmp_path / "ck.npz")
    save_checkpoint(ckpt, a)
    for _ in a.run(4):
        pass

    b = load_checkpoint(ckpt, src, dst)
    assert b.head == 200 + 4 * 20 and b.step_idx == 4
    for _ in b.run(4):
        pass

    np.testing.assert_array_equal(np.asarray(a.state.p), np.asarray(b.state.p))
    np.testing.assert_array_equal(np.asarray(a.state.r), np.asarray(b.state.r))
    np.testing.assert_array_equal(np.asarray(a.graph.deg), np.asarray(b.graph.deg))


def test_checkpoint_resume_hybrid(tmp_path):
    """Hybrid-driver checkpoints resume exactly (snapshot rebuilt on load)."""
    from pprx.graph.hybrid_stream import HybridStreamDriver

    n, total = 30, 400
    src, dst, _ = synthetic_powerlaw_stream(n, total, seed=8)
    scfg = StreamConfig(window=200, slide=20)
    a = HybridStreamDriver(src, dst, n, [0, 5], CFG, scfg, dtype=jnp.float64)
    a.seed()
    for _ in a.run(4):
        pass
    ckpt = str(tmp_path / "ckh.npz")
    save_checkpoint(ckpt, a)
    for _ in a.run(4):
        pass

    b = load_checkpoint(ckpt, src, dst)
    assert isinstance(b, HybridStreamDriver)
    for _ in b.run(4):
        pass
    np.testing.assert_array_equal(np.asarray(a.state.p), np.asarray(b.state.p))
    np.testing.assert_array_equal(np.asarray(a.state.r), np.asarray(b.state.r))
