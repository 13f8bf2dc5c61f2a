"""Pallas TPU kernel for the push round's edge sweep (SURVEY.md §2.1
"Forward-push kernel" ● — the native-tier hot op).

Why a kernel: the XLA dense round materializes the gathered per-edge mass
matrix [E, S] to HBM and then scatter-adds it back — ~2*E*S*4 bytes of pure
round-trip traffic. This kernel computes delta = A_pull @ moving directly:

- PULL formulation: edges are laid out in CSC order (grouped by the SCATTER
  endpoint). The grid walks destination row-tiles; each tile's incoming
  edges DMA their source's ``moving`` row from HBM (random ~S*4-byte reads,
  depth-``RING`` pipelined) and accumulate into a VMEM tile that is written
  to HBM exactly once. No atomics (TPU grid steps are sequential on a
  core), no read-modify-write to HBM, no [E, S] intermediate.
- The reference solves the same problem with atomicAdd + warp-balanced
  expansion (SURVEY.md §2.1/§2.4); the TPU shape of that solution is
  "pre-group by destination + accumulate on-chip".

The kernel computes only the edge sweep; activity masking, reserve
absorption and dangling closed-forms stay in XLA (elementwise, fused by
XLA into the moving computation). Exactness vs the XLA path is tested in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # destination rows per grid tile
CHUNK = 1024  # edge-id chunk staged into SMEM per DMA (Mosaic 1-D int32
# memrefs are (1024)-tiled: DMA slices must be 1024-sized and -aligned, so
# chunks are GLOBAL aligned windows intersected with the tile's edge range)
RING = 8  # in-flight source-row DMA depth


def _sweep_kernel(bounds_ref, dst_ref, src_ref, moving_hbm, out_ref, acc, rows, sems, idx_sems):
    """One destination tile: acc[w - base] += moving[u] for CSC edges u->w.

    bounds_ref: SMEM (ntiles, 2) — per-tile [e_lo, e_hi) edge ranges
        (whole array; blocked SMEM specs hit TPU tiling constraints).
    dst_ref/src_ref: ANY int32[ecap_padded] — CSC edge arrays.
    moving_hbm: ANY [N+1, S].
    out_ref: VMEM (TILE, S) output tile; acc: VMEM scratch (TILE, S).
    rows: VMEM (RING, 1, S) ring of in-flight source rows.
    sems: (RING,) DMA sems; idx_sems: (2,) DMA sems for index chunks.
    """
    tile = pl.program_id(0)
    e_lo = bounds_ref[tile, 0]
    e_hi = bounds_ref[tile, 1]
    n_edges = e_hi - e_lo
    tile_base = tile * TILE
    acc[...] = jnp.zeros_like(acc)

    def body(dst_ids, src_ids):
        # dst_ids/src_ids: SMEM (CHUNK,) edge-id staging. Not double-buffered:
        # one 4KB id DMA serves 1024 row DMAs, so its latency is noise (and
        # 2-D SMEM int32 is (2,128)-tiled, which rejects row slicing anyway).
        def idx_dma(chunk_start):
            return (
                pltpu.make_async_copy(
                    dst_ref.at[pl.ds(chunk_start, CHUNK)], dst_ids, idx_sems.at[0]
                ),
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(chunk_start, CHUNK)], src_ids, idx_sems.at[1]
                ),
            )

        def row_dma(slot, src_id):
            return pltpu.make_async_copy(
                moving_hbm.at[pl.ds(src_id, 1)],
                rows.at[slot],
                sems.at[slot],
            )

        # Global 1024-aligned chunk window covering [e_lo, e_hi).
        c0 = e_lo // jnp.int32(CHUNK)
        c1 = pl.cdiv(e_hi, jnp.int32(CHUNK))

        def chunk_body(c, _):
            base = c * jnp.int32(CHUNK)
            a, b = idx_dma(base)
            a.start()
            b.start()
            a.wait()
            b.wait()
            # this tile's edges within the chunk: [lo, hi)
            lo = jnp.maximum(e_lo - base, 0)
            hi = jnp.minimum(e_hi - base, jnp.int32(CHUNK))

            # warm the row ring (static RING unrolled, masked)
            for k in range(RING):
                @pl.when(lo + k < hi)
                def _(k=k):
                    e = lo + k
                    row_dma(jax.lax.rem(e, jnp.int32(RING)), src_ids[e]).start()

            def edge_body(e, _):
                slot = jax.lax.rem(e, jnp.int32(RING))
                row_dma(slot, src_ids[e]).wait()
                row = rows[pl.ds(slot, 1), 0]  # [1, ...lanes]
                local_row = dst_ids[e] - tile_base
                acc[pl.ds(local_row, 1)] += row

                @pl.when(e + RING < hi)
                def _():
                    row_dma(slot, src_ids[e + RING]).start()

                return 0

            jax.lax.fori_loop(lo, hi, edge_body, 0)
            return 0

        jax.lax.fori_loop(c0, c1, chunk_body, 0)

    pl.run_scoped(
        body,
        dst_ids=pltpu.SMEM((CHUNK,), jnp.int32),
        src_ids=pltpu.SMEM((CHUNK,), jnp.int32),
    )
    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("n_pad", "interpret"))
def edge_sweep(
    moving: jnp.ndarray,
    tile_bounds: jnp.ndarray,
    csc_src: jnp.ndarray,
    csc_dst: jnp.ndarray,
    n_pad: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """delta[w, s] = sum over CSC edges (u -> w) of moving[u, s].

    moving: [N+1, S]. tile_bounds: int32[n_pad/TILE, 2] per-tile [e_lo, e_hi)
    into the CSC arrays (build with ``csc_arrays``). csc_src/csc_dst: CSC
    edge endpoints, padded by >= CHUNK (DMA over-read slack).
    Returns delta [n_pad, S].
    """
    assert n_pad % TILE == 0
    s = moving.shape[1]
    if s > 128 and s % 128 == 0:
        # fold lanes into a (S/128, 128) trailing pair: Mosaic's HBM slice
        # tiling rejects [1, S] row slices for S > 128, but 3-D slices whose
        # trailing two dims are full-size are unconstrained.
        groups = s // 128
        out = _edge_sweep_call(
            moving.reshape(moving.shape[0], groups, 128),
            tile_bounds, csc_src, csc_dst, n_pad, interpret,
        )
        return out.reshape(n_pad, s)
    return _edge_sweep_call(moving, tile_bounds, csc_src, csc_dst, n_pad, interpret)


def _edge_sweep_call(moving, tile_bounds, csc_src, csc_dst, n_pad, interpret):
    s = moving.shape[1:]
    grid = (n_pad // TILE,)
    return pl.pallas_call(
        _sweep_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # edge arrays + moving stay in HBM: ANY lets Mosaic pick VMEM,
            # whose (1024)/(8,128) tiling rejects the kernel's arbitrary
            # dynamic slice offsets; HBM slices are unconstrained.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (TILE,) + s, lambda i: (i,) + (0,) * len(s), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad,) + s, moving.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE,) + s, moving.dtype),
            pltpu.VMEM((RING, 1) + s, moving.dtype),
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tile_bounds, csc_dst, csc_src, moving)


def csc_arrays(src, dst, n: int):
    """Host-side CSC build for the kernel: sort edges by dst, compute
    per-tile edge bounds over n_pad = ceil((n+1)/TILE)*TILE rows.

    Phantom-padded edges (dst == n) land in row n's tile and contribute
    moving[n] == 0. Returns (tile_bounds, csc_src, csc_dst, n_pad).
    """
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    order = np.argsort(dst, kind="stable")
    csc_src = src[order].astype(np.int32)
    csc_dst = dst[order].astype(np.int32)
    n_pad = ((n + 1 + TILE - 1) // TILE) * TILE
    offsets = np.searchsorted(csc_dst, np.arange(0, n_pad + 1, TILE))
    tile_bounds = np.stack([offsets[:-1], offsets[1:]], axis=1).astype(np.int32)
    pad = np.zeros(CHUNK, np.int32)
    return (
        jnp.asarray(tile_bounds),
        jnp.asarray(np.concatenate([csc_src, pad])),
        jnp.asarray(np.concatenate([csc_dst, pad])),
        n_pad,
    )
