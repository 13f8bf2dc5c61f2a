"""Pallas edge-sweep kernel vs XLA reference (SURVEY.md §4 "Kernel" tier).

On CPU the kernel runs in interpret mode; set PPRX_TEST_TPU=1 to exercise
the compiled Mosaic path on hardware.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.engine.pallas_push import CHUNK, RING, TILE, csc_arrays, edge_sweep
from tests.conftest import random_multigraph

INTERPRET = os.environ.get("PPRX_TEST_TPU", "0") != "1"


def xla_reference(moving, src, dst, n_pad):
    delta = jnp.zeros((n_pad, moving.shape[1]), moving.dtype)
    return delta.at[dst].add(moving[src])


@pytest.mark.parametrize("seed,n,m,s", [(0, 100, 700, 8), (1, 300, 2000, 16), (2, 50, 120, 4)])
def test_edge_sweep_matches_xla(seed, n, m, s):
    rng = np.random.default_rng(seed)
    src, dst = random_multigraph(rng, n, m)
    moving = jnp.asarray(rng.normal(size=(n + 1, s)).astype(np.float32))
    moving = moving.at[n].set(0.0)
    bounds, csc_src, csc_dst, n_pad = csc_arrays(src, dst, n)
    got = edge_sweep(moving, bounds, csc_src, csc_dst, n_pad, interpret=INTERPRET)
    want = xla_reference(moving, jnp.asarray(src), jnp.asarray(dst), n_pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_edge_sweep_skew_and_empty_tiles():
    """A hub vertex receiving most edges (tile with >> CHUNK edges) plus many
    empty tiles; exercises chunk pipelining and m < RING warm paths."""
    rng = np.random.default_rng(3)
    n = 2 * TILE + 7
    m = 3 * CHUNK + 11
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = np.full(m, 5, np.int64)  # all edges into one hub
    dst[-3:] = n - 1  # a few into the last tile
    moving = jnp.asarray(rng.normal(size=(n + 1, 8)).astype(np.float32))
    bounds, csc_src, csc_dst, n_pad = csc_arrays(src, dst, n)
    got = edge_sweep(moving, bounds, csc_src, csc_dst, n_pad, interpret=INTERPRET)
    want = xla_reference(moving, jnp.asarray(src), jnp.asarray(dst), n_pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_edge_sweep_phantom_padding():
    """Window-buffer padding edges (src = dst = n) must contribute zero."""
    rng = np.random.default_rng(4)
    n, m = 60, 200
    src, dst = random_multigraph(rng, n, m)
    src = np.concatenate([src, np.full(50, n)])
    dst = np.concatenate([dst, np.full(50, n)])
    moving = jnp.asarray(rng.normal(size=(n + 1, 8)).astype(np.float32))
    moving = moving.at[n].set(0.0)
    bounds, csc_src, csc_dst, n_pad = csc_arrays(src, dst, n)
    got = edge_sweep(moving, bounds, csc_src, csc_dst, n_pad, interpret=INTERPRET)
    want = xla_reference(moving, jnp.asarray(src), jnp.asarray(dst), n_pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
