"""Pallas segment-sum kernel (pprx/engine/segsum.py) parity tests.

The kernel is the native-tier implementation of the delivery-sorted
residual scatter (SURVEY.md §2.1 "Forward-push kernel" ●). Parity oracle:
the XLA sorted scatter-add it replaces. Interpret mode on CPU; set
PPRX_TEST_TPU=1 to run Mosaic-compiled.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pprx.engine.segsum import pad_len, segsum_add, tile_offsets

INTERPRET = os.environ.get("PPRX_TEST_TPU", "0") != "1"


def _mk(rng, n_rows, w, s, tr, ec, skew=False):
    """Delivery-sorted edge set: seg ids ascending, padded tail -> last row."""
    if skew:
        # power-law-ish: most edges land on few rows
        seg = np.minimum(
            rng.zipf(1.3, size=w) % (n_rows - 1), n_rows - 2
        ).astype(np.int32)
    else:
        seg = rng.integers(0, n_rows - 1, size=w).astype(np.int32)
    seg.sort()
    w_pad = pad_len(w, ec)
    seg_p = np.full(w_pad, n_rows - 1, np.int32)
    seg_p[:w] = seg
    contrib = np.zeros((w_pad, s), np.float32)
    contrib[:w] = rng.normal(size=(w, s)).astype(np.float32)
    rin = rng.normal(size=(n_rows, s)).astype(np.float32)
    # destination-CSR offsets over n_rows segments
    counts = np.bincount(seg_p, minlength=n_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    toff = tile_offsets(jnp.asarray(offsets), n_rows, tr)
    return (
        jnp.asarray(rin),
        jnp.asarray(contrib),
        jnp.asarray(seg_p.reshape(-1, 128)),
        toff,
        seg_p,
    )


@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize(
    "n_rows,w,s,tr,ec",
    [
        (513, 6000, 128, 256, 2048),
        (129, 2048, 8, 128, 256),
        (1025, 10000, 128, 512, 1024),
    ],
)
def test_segsum_matches_scatter(rng, n_rows, w, s, tr, ec, skew):
    rin, contrib, seg2d, toff, seg = _mk(rng, n_rows, w, s, tr, ec, skew)
    out = segsum_add(rin, contrib, seg2d, toff, tr=tr, ec=ec, interpret=INTERPRET)
    ref = rin.astype(jnp.float32).at[jnp.asarray(seg)].add(
        contrib, indices_are_sorted=True
    )
    # tolerance: the kernel accumulates per 128-edge group via matmul, a
    # different (still deterministic) FP order than the scatter chain
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_segsum_empty_tiles(rng):
    # rows at the front/back receive nothing; all edges hit one middle row
    n_rows, w, s, tr, ec = 1024, 4096, 128, 256, 2048
    seg = np.full(w, 600, np.int32)
    w_pad = pad_len(w, ec)
    seg_p = np.full(w_pad, n_rows - 1, np.int32)
    seg_p[:w] = seg
    contrib = np.zeros((w_pad, s), np.float32)
    contrib[:w] = 1.0
    rin = np.zeros((n_rows, s), np.float32)
    counts = np.bincount(seg_p, minlength=n_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    toff = tile_offsets(jnp.asarray(offsets), n_rows, tr)
    out = np.asarray(
        segsum_add(
            jnp.asarray(rin),
            jnp.asarray(contrib),
            jnp.asarray(seg_p.reshape(-1, 128)),
            toff,
            tr=tr,
            ec=ec,
            interpret=INTERPRET,
        )
    )
    assert out[600, 0] == w
    assert np.abs(out).sum() == w * s
