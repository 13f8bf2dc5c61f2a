"""Pallas TPU segment-sum kernel for the delivery-sorted residual scatter.

The hot op of every window-scale push round (SURVEY.md §2.1 "Forward-push
kernel" ● — the native-tier scatter) is

    r2[w, s] += sum over delivery-sorted edges j with seg[j] == w of contrib[j, s]

XLA lowers this to a scatter-add that measured ~25-50 GB/s on v5e even with
``indices_are_sorted=True`` (17.7 ms at W=2M, S=128 — PERFORMANCE.md), an
order of magnitude under HBM speed of light. This kernel exploits what the
scatter cannot: the edges are ALREADY grouped by destination (the KillGraph
keeps a delivery-sorted snapshot view), so each output row-tile's
contributions live in one contiguous edge range.

Shape of the solution (the TPU-native analogue of the reference's
atomicAdd scatter):

- grid over output row tiles [TR, S]; tile i owns rows [i*TR, (i+1)*TR) and
  consumes the contiguous edge range [tile_off[i], tile_off[i+1]) — computed
  once per snapshot from the destination-CSR offsets;
- edge chunks of EC edges are double-buffered HBM→VMEM (contrib values +
  their segment ids); chunk windows are EC-aligned GLOBAL windows, so DMA
  offsets always satisfy Mosaic's tiling constraints — edges of neighboring
  tiles that share a boundary chunk are harmless because their one-hot
  column is zero (their seg id falls outside this tile's row range);
- accumulation rides the (otherwise idle) MXU: for each 128-edge group,
  acc += onehot(seg == tile_rows) @ contrib — a [TR,128]@[128,S] matmul.
  At W=2M/S=128/TR=128 that is ~66 GFLOP/sweep ≈ 1.8 ms of f32 MXU time,
  plus one streaming read of contrib (134+ GB/s) — ~4-8x the XLA scatter.
- the kernel fuses the row-tile's base-state add (out = r_in + segsum), so
  the caller's residual update is one pass.

No atomics, no data-dependent shapes: determinism and jit-compatibility by
construction. Parity with the XLA scatter path is tested in
tests/test_segsum.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Edge arrays are padded to a multiple of EC_PAD by the graph builders so any
# kernel chunk size ec ∈ {128, 256, ..., EC_PAD} divides the padded length.
EC_PAD = 2048

# Engine defaults (A/B swept on v5e at W=2M/S=128/N=200k — PERFORMANCE.md
# round 2: tr=256/ec=1024/split3 is 3.0x the XLA sorted scatter AND closer
# to the f64 truth than the XLA f32 scatter chain, 1.5e-7 vs 5.6e-7).
SEGSUM_TR = 256
SEGSUM_EC = 1024


def _segsum_kernel(tile_off_ref, rin_ref, contrib_hbm, seg_hbm, out_ref,
                   acc, cbuf, sbuf, sems, *, ec: int, tr: int,
                   precision: str):
    i = pl.program_id(0)
    e_lo = tile_off_ref[i]
    e_hi = tile_off_ref[i + 1]
    r0 = i * tr
    g = ec // 128
    acc[...] = jnp.zeros_like(acc)

    # EC-aligned global chunk window covering [e_lo, e_hi)
    c0 = e_lo // jnp.int32(ec)
    c1 = pl.cdiv(e_hi, jnp.int32(ec))

    def dma(slot, c):
        return (
            pltpu.make_async_copy(
                contrib_hbm.at[pl.ds(c * ec, ec), :], cbuf.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                seg_hbm.at[pl.ds(c * g, g), :], sbuf.at[slot],
                sems.at[slot, 1],
            ),
        )

    @pl.when(c0 < c1)
    def _():
        a, b = dma(0, c0)
        a.start()
        b.start()

    row_ids = r0 + jax.lax.broadcasted_iota(jnp.int32, (tr, 1), 0)

    def chunk_body(c, _):
        slot = jax.lax.rem(c - c0, jnp.int32(2))

        @pl.when(c + 1 < c1)
        def _():
            a, b = dma(1 - slot, c + 1)
            a.start()
            b.start()

        a, b = dma(slot, c)
        a.wait()
        b.wait()
        for gi in range(g):
            seg_row = sbuf[slot, pl.ds(gi, 1), :]  # [1, 128] int32
            c_g = cbuf[slot, pl.ds(gi * 128, 128), :]  # [128, S]
            # bf16 contribs: one default-precision MXU pass (the one-hot m
            # is exact in bf16; bf16 x bf16 -> f32 accumulation) — halves
            # the contribution DMA vs f32+limb-splitting, at the cost of
            # 2^-9-relative delivery rounding (opt-in, see dense_round)
            m = (seg_row == row_ids).astype(
                c_g.dtype if c_g.dtype == jnp.bfloat16 else acc.dtype
            )  # [tr, 128]
            if c_g.dtype == jnp.bfloat16:
                acc[...] += jnp.dot(m, c_g, preferred_element_type=acc.dtype)
            elif precision in ("split", "split3"):
                # exact-one-hot m times a bf16 limb split of the values:
                # each DEFAULT-precision MXU pass is exact (m's 0/1 entries
                # are exact in bf16, limb products are exact, f32
                # accumulation), so k limbs recover ~2^(-8k) relative
                # accuracy. Only the values operand needs splitting —
                # cheaper than Precision.HIGHEST's two-sided emulation.
                hi = c_g.astype(jnp.bfloat16).astype(acc.dtype)
                lo = c_g - hi
                acc[...] += jnp.dot(m, hi, preferred_element_type=acc.dtype)
                if precision == "split3":
                    mid = lo.astype(jnp.bfloat16).astype(acc.dtype)
                    acc[...] += jnp.dot(
                        m, mid, preferred_element_type=acc.dtype
                    )
                    lo = lo - mid
                acc[...] += jnp.dot(m, lo, preferred_element_type=acc.dtype)
            else:
                acc[...] += jnp.dot(
                    m, c_g, preferred_element_type=acc.dtype,
                    precision=(jax.lax.Precision.HIGHEST
                               if precision == "highest" else None),
                )
        return 0

    jax.lax.fori_loop(c0, c1, chunk_body, 0)
    out_ref[...] = rin_ref[...] + acc[...]


@functools.partial(
    jax.jit, static_argnames=("tr", "ec", "interpret", "precision")
)
def segsum_add(
    rin: jnp.ndarray,
    contribs: jnp.ndarray,
    seg2d: jnp.ndarray,
    tile_off: jnp.ndarray,
    tr: int = SEGSUM_TR,
    ec: int = SEGSUM_EC,
    interpret: bool | None = None,
    precision: str = "split3",
) -> jnp.ndarray:
    """out[w] = rin[w] + sum_{j: seg[j]==w} contribs[j].

    rin: [R, S] base state rows (R = N+1, any row count — the last grid
        tile's padding rows are masked on store).
    contribs: [W_pad, S] per-edge contributions, DELIVERY-SORTED (grouped by
        segment id); W_pad must be a multiple of ``ec``. Padding edges must
        carry zero contributions or out-of-range segment ids.
    seg2d: int32 [W_pad // 128, 128] — the segment id of each edge, same
        order, reshaped row-major (Mosaic rejects 1-D int DMA at arbitrary
        offsets; 2-D rows are (8,128)-tiled and ec/128 >= 8 keeps offsets
        aligned).
    tile_off: int32 [cdiv(R, tr) + 1] — tile i consumes the contiguous edge
        range [tile_off[i], tile_off[i+1]). Monotone; tile_off[-1] <= W_pad.
    interpret: None (default) auto-selects Pallas interpret mode off-TPU so
        the same engine code runs under the CPU test backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, s = rin.shape
    w_pad = contribs.shape[0]
    assert contribs.dtype in (rin.dtype, jnp.bfloat16)
    assert w_pad % ec == 0 and ec % 128 == 0
    assert seg2d.shape == (w_pad // 128, 128)
    ntiles = pl.cdiv(n_rows, tr)
    assert tile_off.shape[0] == ntiles + 1
    kernel = functools.partial(_segsum_kernel, ec=ec, tr=tr, precision=precision)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (tr, s), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, s), rin.dtype),
        input_output_aliases={1: 0},  # rin -> out: in-place base update
        scratch_shapes=[
            pltpu.VMEM((tr, s), rin.dtype),
            pltpu.VMEM((2, ec, s), contribs.dtype),
            pltpu.VMEM((2, ec // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(tile_off, rin, contribs, seg2d)


def pad_len(w: int, ec: int = EC_PAD) -> int:
    """Edge-array length padded so every supported chunk size divides it."""
    return ((w + ec - 1) // ec) * ec


def tile_offsets(offsets: jnp.ndarray, n_rows: int, tr: int) -> jnp.ndarray:
    """tile_off from destination-CSR offsets (int32 [R+1] monotone):
    tile_off[i] = offsets[min(i*tr, R)]. Jittable; runs at snapshot build."""
    ntiles = (n_rows + tr - 1) // tr
    idx = jnp.minimum(jnp.arange(ntiles + 1) * tr, n_rows)
    return offsets[idx].astype(jnp.int32)
