"""Row-sharded push engine: shard_map + XLA collectives (SURVEY.md §3.5, L5).

The reference is single-GPU; distribution is a build-first-class component
([BASELINE] config 5). Design:

- Vertices are row-sharded over the mesh 'rows' axis: each shard owns a
  contiguous block of N_local vertices — their p/r rows, their out-degrees,
  and every window edge whose GATHER endpoint it owns (forward mode gathers
  at src, reverse mode at dst). Queries are data-parallel over 'srcs'.
- A push round is: local gather+scale over owned edges, scatter into a
  global-size delta, then ONE ``lax.psum_scatter`` (reduce-scatter) over
  'rows' delivers each shard the summed residual delta for its vertices.
  Convergence is a ``lax.psum`` of active counts — the whole while_loop
  stays inside one shard_map call, no host sync per round.
- Reverse-mode per-edge weights 1/d_out(u) factor OUT of the per-vertex sum
  (d_out(u) is constant across contributions into u), so the scatter carries
  unweighted mass and the owner applies inv_deg locally — no remote degree
  lookups.
- Dynamic updates ride the same machinery: per-edge correction terms
  accumulate into the same global delta + one reduce-scatter; per-vertex
  closed-form terms (see pprx.engine.update for the formulas) are purely
  local. Reverse-mode row-sums use the transpose trick: scatter p[dst]
  along edges to src rows and reduce-scatter — two extra edge sweeps per
  slide, zero remote gathers.

Buffer layout: each shard's edge buffer has ``ecap`` usable slots plus one
TRASH slot at local index ecap. Padding entries of every host-supplied
batch target the trash slot with valid=0, so scatter writes never collide
with live slots and no masking is needed on the store path.

This is the 'dense_rs' exchange mode of SURVEY.md §5: per-round traffic is
O(N_pad * S_local) per shard via reduce-scatter, independent of frontier
size. The bucketed ragged all-to-all mode (O(frontier) traffic) is the
planned optimization for very large N; dense_rs is exact, static-shaped,
and collective-efficient.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from pprx.config import PprConfig
from pprx.engine.state import FORWARD


class EdgePartition(NamedTuple):
    """Host-built edge arrays, concatenated per shard (shard-major, stride
    ecap+1 with the trash slot last).

    gather_local: LOCAL vertex index of the gather endpoint (src in forward
        mode, dst in reverse mode) within its owner shard.
    other_global: GLOBAL index of the scatter endpoint.
    valid: int32 1/0.
    counts: [n_rows] live-edge count per shard (host bookkeeping).
    """

    gather_local: np.ndarray
    other_global: np.ndarray
    valid: np.ndarray
    counts: np.ndarray


def partition_edges(
    src: np.ndarray, dst: np.ndarray, n_local: int, n_rows: int, ecap: int, by: str
) -> EdgePartition:
    """Group edges by the owner shard of their gather endpoint.

    Within each shard, edges occupy slots [0, count); padding (and the trash
    slot) carry valid=0.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    key = src if by == "src" else dst
    other = dst if by == "src" else src
    owner = key // n_local
    stride = ecap + 1
    gl = np.zeros(n_rows * stride, np.int32)
    og = np.zeros(n_rows * stride, np.int32)
    va = np.zeros(n_rows * stride, np.int32)
    counts = np.zeros(n_rows, np.int64)
    for k in range(n_rows):
        sel = owner == k
        cnt = int(sel.sum())
        if cnt > ecap:
            raise ValueError(f"shard {k} owns {cnt} edges > per-shard capacity {ecap}")
        base = k * stride
        gl[base : base + cnt] = key[sel] - k * n_local
        og[base : base + cnt] = other[sel]
        va[base : base + cnt] = 1
        counts[k] = cnt
    return EdgePartition(gl, og, va, counts)


def forward_corrections(
    p, r, deg, del_u, del_w, del_v, ins_u, ins_w, ins_v, alpha_f, dtype, n_pad
):
    """Block-local forward-mode batched corrections (invariant-exact rules,
    see pprx.engine.update): delete phase at old degrees, then insert phase
    at post-delete degrees. Returns (p, r, acc, deg2) — ``acc`` is the
    [n_pad, S] cross-shard correction delivery the caller reduce-scatters.
    Shared by the dense slide and the wl slide (pprx.dist.wl)."""
    p, r, ids, vals, deg2 = forward_corrections_pairs(
        p, r, deg, del_u, del_w, del_v, ins_u, ins_w, ins_v,
        alpha_f, dtype, n_pad,
    )
    acc = jnp.zeros((n_pad, p.shape[1]), dtype).at[
        jnp.clip(ids, 0, n_pad - 1)
    ].add(vals)
    return p, r, acc, deg2


def forward_corrections_pairs(
    p, r, deg, del_u, del_w, del_v, ins_u, ins_w, ins_v, alpha_f, dtype, n_pad
):
    """forward_corrections core returning the cross-shard delivery as
    compact per-edge (global id, mass) pairs instead of an [n_pad, S] acc —
    the memory-proportional wl engine ships these through its bucketed a2a
    (pprx.dist.wl). Invalid batch rows get id n_pad and zero mass."""
    alpha = jnp.asarray(alpha_f, dtype)
    beta = (1.0 - alpha) / alpha
    nloc = deg.shape[0]
    d0 = deg
    d0f = jnp.maximum(d0, 1).astype(dtype)
    del_vf = del_v.astype(dtype)[:, None]
    ins_vf = ins_v.astype(dtype)[:, None]

    # ---- delete phase (old p, old degrees) ----
    k_del = jnp.zeros(nloc, jnp.int32).at[del_u].add(del_v)
    per_edge_del = beta * p[del_u] / d0f[del_u, None] * del_vf
    D = d0 - k_del
    touched = k_del > 0
    full = jnp.logical_and(touched, D == 0)
    scale_p = jnp.where(
        touched, jnp.where(D >= 1, D, 1).astype(dtype) / d0f, jnp.ones((), dtype)
    )
    num = jnp.where(full, k_del.astype(dtype) - alpha, k_del.astype(dtype))
    r_add = jnp.where(touched, num / (alpha * d0f), jnp.zeros((), dtype))
    r = r + r_add[:, None] * p
    p = p * scale_p[:, None]

    # ---- insert phase (post-delete p and degrees) ----
    d1 = D
    d1f = jnp.maximum(d1, 1).astype(dtype)
    k_ins = jnp.zeros(nloc, jnp.int32).at[ins_u].add(ins_v)
    per_edge_ins = beta * p[ins_u] / d1f[ins_u, None] * ins_vf
    touched = k_ins > 0
    from_dang = jnp.logical_and(touched, d1 == 0)
    scale_p = jnp.where(
        touched,
        jnp.where(from_dang, k_ins.astype(dtype), (d1 + k_ins).astype(dtype) / d1f),
        jnp.ones((), dtype),
    )
    num = jnp.where(from_dang, k_ins.astype(dtype) - alpha, k_ins.astype(dtype))
    denom = jnp.where(from_dang, alpha, alpha * d1f)
    r_sub = jnp.where(touched, num / denom, jnp.zeros((), dtype))
    r = r - r_sub[:, None] * p
    p = p * scale_p[:, None]
    ids = jnp.concatenate([
        jnp.where(del_v > 0, del_w, n_pad).astype(jnp.int32),
        jnp.where(ins_v > 0, ins_w, n_pad).astype(jnp.int32),
    ])
    vals = jnp.concatenate([-per_edge_del, per_edge_ins])
    return p, r, ids, vals, d1 + k_ins


def reverse_corrections(
    p, r, deg, egl, eog, eva,
    del_u, del_v, ins_u, ins_v,
    clear_slots, write_slots, write_dl, write_sg, write_v,
    alpha_f, dtype, n_pad,
):
    """Block-local reverse-mode batched corrections + window-buffer
    mutation: row-sum deltas fused into ONE stacked reduce-scatter (see the
    derivation notes in the reverse slide builder). Returns
    (p, r, d_new, egl2, eog2, eva2)."""
    alpha = jnp.asarray(alpha_f, dtype)
    beta = (1.0 - alpha) / alpha
    nloc = deg.shape[0]
    s_loc = p.shape[1]

    acc = jnp.zeros((n_pad, 2 * s_loc), dtype)
    contrib = p[egl] * eva.astype(dtype)[:, None]
    acc = acc.at[eog, :s_loc].add(contrib)
    old_v = eva[clear_slots].astype(dtype)[:, None]
    acc = acc.at[eog[clear_slots], s_loc:].add(-p[egl[clear_slots]] * old_v)
    acc = acc.at[write_sg, s_loc:].add(p[write_dl] * write_v.astype(dtype)[:, None])
    red = jax.lax.psum_scatter(acc, "rows", scatter_dimension=0, tiled=True)
    s_old = red[:, :s_loc]
    s_new = s_old + red[:, s_loc:]

    eva2 = eva.at[clear_slots].set(0)
    egl2 = egl.at[write_slots].set(write_dl)
    eog2 = eog.at[write_slots].set(write_sg)
    eva2 = eva2.at[write_slots].set(write_v)
    eva2 = eva2.at[-1].set(0)

    r, d_new = reverse_apply(
        p, r, deg, del_u, del_v, ins_u, ins_v, s_old, s_new, alpha_f, dtype
    )
    return p, r, d_new, egl2, eog2, eva2


def reverse_apply(p, r, deg, del_u, del_v, ins_u, ins_v, s_old, s_new,
                  alpha_f, dtype):
    """Tail of the reverse-mode corrections, shared by the acc-sweep form
    above and the delivery-sorted form in pprx.dist.wl: given this shard's
    OLD and NEW out-row sums of p, apply r += beta*((P'p) - (Pp)) and the
    degree update. Returns (r, d_new)."""
    alpha = jnp.asarray(alpha_f, dtype)
    beta = (1.0 - alpha) / alpha
    nloc = deg.shape[0]
    k_del = jnp.zeros(nloc, jnp.int32).at[del_u].add(del_v)
    k_ins = jnp.zeros(nloc, jnp.int32).at[ins_u].add(ins_v)
    d_new = deg - k_del + k_ins
    d0f = jnp.maximum(deg, 1).astype(dtype)
    dnf = jnp.maximum(d_new, 1).astype(dtype)
    pp_old = jnp.where((deg == 0)[:, None], p, s_old / d0f[:, None])
    pp_new = jnp.where((d_new == 0)[:, None], p, s_new / dnf[:, None])
    r = r + beta * (pp_new - pp_old)
    return r, d_new


class ShardedEngine:
    """Factory of jitted sharded programs for one (mesh, shapes, cfg, mode).

    All public methods take/return GLOBAL jax arrays laid out with
    NamedSharding; use ``init_state``/``device_graph`` to construct them.
    Batches passed to ``slide`` are built by the host driver
    (pprx.dist.stream.ShardedStreamDriver), padded per shard to ``bcap``
    with trash-slot targets.
    """

    def __init__(
        self,
        mesh: jax.sharding.Mesh,
        n: int,
        s_total: int,
        ecap: int,
        bcap: int,
        cfg: PprConfig,
        mode: int = FORWARD,
        dtype=jnp.float32,
        exchange: str = "dense_rs",
        ccap: int = 1024,
    ):
        """exchange: 'dense_rs' (reduce-scatter of the dense delta — exact,
        O(N_pad*S) traffic/round) or 'a2a' (bucketed all-to-all of the
        nonzero (dst, mass) rows — O(frontier) traffic; rows beyond the
        per-shard-pair bucket capacity ``ccap`` stay in a local carry buffer
        and ship next round, SURVEY.md §5 'overflow -> extra round')."""
        self.mesh = mesh
        self.n = n
        self.n_rows = mesh.shape["rows"]
        self.n_srcs = mesh.shape["srcs"]
        if s_total % self.n_srcs != 0:
            raise ValueError(f"s_total {s_total} not divisible by srcs axis {self.n_srcs}")
        if exchange not in ("dense_rs", "a2a"):
            raise ValueError(f"unknown exchange mode {exchange!r}")
        self.s_total = s_total
        self.n_local = math.ceil((n + 1) / self.n_rows)
        self.n_pad = self.n_local * self.n_rows
        self.ecap = ecap
        self.slot_stride = ecap + 1  # + trash slot
        self.trash_slot = ecap
        self.bcap = bcap
        self.cfg = cfg
        self.mode = mode
        self.dtype = dtype
        self.exchange = exchange
        self.ccap = min(ccap, self.n_local)

        self.state_spec = P("rows", "srcs")
        self.row_spec = P("rows")
        rep = P()
        spec_state = self.state_spec
        spec_row = self.row_spec

        smap = functools.partial(shard_map, mesh=mesh, check_vma=False)

        def _push_loop(p, r, deg, egl, eog, eva):
            """Block-local; p/r [N_local, S_loc], deg [N_local], edges [stride]."""
            cfg_ = self.cfg
            alpha = jnp.asarray(cfg_.alpha, dtype)
            n_pad = self.n_pad

            def active(r_):
                if self.mode == FORWARD:
                    th = cfg_.eps * jnp.maximum(deg, 1).astype(dtype)
                    return jnp.abs(r_) > th[:, None]
                return jnp.abs(r_) > jnp.asarray(cfg_.eps, dtype)

            inv_deg = (1.0 / jnp.maximum(deg, 1).astype(dtype))[:, None]
            dangling = (deg == 0)[:, None]
            evaf = eva.astype(dtype)[:, None]

            n_rows = self.n_rows
            n_local = self.n_local
            ccap = self.ccap

            def exchange_dense_rs(acc, carry):
                delta = jax.lax.psum_scatter(acc, "rows", scatter_dimension=0, tiled=True)
                return delta, carry

            def exchange_a2a(acc, carry):
                """Ship only nonzero (dst_local, mass[S]) rows per shard pair,
                padded to ccap; rows beyond capacity wait in ``carry``."""
                s_loc = acc.shape[1]
                blocks = (acc + carry).reshape(n_rows, n_local, s_loc)
                rownz = jnp.abs(blocks).sum(axis=2) > 0  # [n_rows, N_local]
                ids = jax.vmap(
                    lambda m: jnp.nonzero(m, size=ccap, fill_value=0)[0].astype(jnp.int32)
                )(rownz)  # [n_rows, ccap]
                valid = jnp.take_along_axis(rownz, ids, axis=1)  # padding id 0 may
                # be a genuinely nonzero row only if it was ALSO selected first,
                # in which case nonzero() listed it at most once; re-derive
                # validity positionally instead to dodge the id-0 ambiguity:
                n_nz = jnp.sum(rownz, axis=1)  # [n_rows]
                pos = jax.lax.broadcasted_iota(jnp.int32, (n_rows, ccap), 1)
                valid = pos < n_nz[:, None]
                masses = jnp.take_along_axis(blocks, ids[:, :, None], axis=1)
                masses = masses * valid[:, :, None].astype(dtype)
                sent = jnp.zeros((n_rows, n_local), dtype).at[
                    jax.lax.broadcasted_iota(jnp.int32, (n_rows, ccap), 0), ids
                ].max(valid.astype(dtype))
                carry2 = (blocks * (1.0 - sent[:, :, None])).reshape(n_pad, s_loc)
                recv_ids = jax.lax.all_to_all(
                    ids, "rows", split_axis=0, concat_axis=0, tiled=True
                )
                recv_mass = jax.lax.all_to_all(
                    masses, "rows", split_axis=0, concat_axis=0, tiled=True
                )
                delta = (
                    jnp.zeros((n_local, s_loc), dtype)
                    .at[recv_ids.reshape(-1)]
                    .add(recv_mass.reshape(-1, s_loc))
                )
                return delta, carry2

            def round_(p, r, carry):
                act = active(r)
                mass = jnp.where(act, r, jnp.zeros((), dtype))
                p2 = p + jnp.where(dangling, mass, alpha * mass)
                r2 = r - mass
                if self.mode == FORWARD:
                    moving = (1.0 - alpha) * mass * inv_deg
                else:
                    beta = (1.0 - alpha) / alpha
                    moving = jnp.where(dangling, beta * mass, (1.0 - alpha) * mass)
                contrib = moving[egl] * evaf
                acc = jnp.zeros((n_pad, mass.shape[1]), dtype).at[eog].add(contrib)
                if self.exchange == "a2a":
                    delta, carry2 = exchange_a2a(acc, carry)
                else:
                    delta, carry2 = exchange_dense_rs(acc, carry)
                if self.mode == FORWARD:
                    r2 = r2 + delta
                else:
                    r2 = r2 + delta * inv_deg
                ep = jax.lax.psum(
                    jnp.sum(act[egl] * evaf, dtype=jnp.float32), ("rows", "srcs")
                )
                pending = jax.lax.psum(
                    jnp.sum(jnp.abs(carry2), dtype=jnp.float32), ("rows", "srcs")
                )
                na = jax.lax.psum(jnp.sum(act, dtype=jnp.float32), ("rows", "srcs"))
                work = na + (pending > 0)  # pending carry forces another round
                return p2, r2, carry2, na, work, ep

            def cond(c):
                _, _, _, work, rounds, _, _ = c
                return jnp.logical_and(work > 0, rounds < cfg_.max_rounds)

            def body(c):
                p, r, carry, _, rounds, pushes, epushes = c
                p2, r2, carry2, na, work, ep = round_(p, r, carry)
                return p2, r2, carry2, work, rounds + 1, pushes + na, epushes + ep

            na0 = jax.lax.psum(jnp.sum(active(r), dtype=jnp.float32), ("rows", "srcs"))
            carry0 = jnp.zeros((n_pad, p.shape[1]), dtype)
            init = (
                p, r, carry0, na0,
                jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32),
            )
            p, r, _, _, rounds, pushes, epushes = jax.lax.while_loop(cond, body, init)
            return p, r, rounds, pushes, epushes

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        @functools.partial(
            smap,
            in_specs=(spec_state, spec_state, spec_row, spec_row, spec_row, spec_row),
            out_specs=(spec_state, spec_state, rep, rep, rep),
        )
        def push_fn(p, r, deg, egl, eog, eva):
            return _push_loop(p, r, deg, egl, eog, eva)

        self._push = push_fn

        if mode == FORWARD:
            self._slide = self._build_forward_slide(smap, _push_loop)
        else:
            self._slide = self._build_reverse_slide(smap, _push_loop)

    # ------------------------------------------------------------------
    def _build_forward_slide(self, smap, push_loop):
        dtype = self.dtype
        n_pad = self.n_pad
        alpha_f = self.cfg.alpha
        spec_state, spec_row, rep = self.state_spec, self.row_spec, P()

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
        @functools.partial(
            smap,
            in_specs=(spec_state, spec_state, spec_row) + (spec_row,) * 11,
            out_specs=(spec_state, spec_state, rep, rep, rep) + (spec_row,) * 4,
        )
        def slide(
            p, r, deg, egl, eog, eva,
            del_u, del_w, del_v,
            ins_u, ins_w, ins_v,
            clear_slots, write_slots,
        ):
            """Forward slide. Batches are partitioned by src owner; entry i of
            the insert batch is written to local slot write_slots[i] (trash
            slot for padding). clear_slots are the expiring edges' slots."""
            p, r, acc, deg2 = forward_corrections(
                p, r, deg, del_u, del_w, del_v, ins_u, ins_w, ins_v,
                alpha_f, dtype, n_pad,
            )
            delta = jax.lax.psum_scatter(acc, "rows", scatter_dimension=0, tiled=True)
            r = r + delta

            # ---- window buffer mutation (local; padding hits trash slot) ----
            eva2 = eva.at[clear_slots].set(0)
            egl2 = egl.at[write_slots].set(ins_u)
            eog2 = eog.at[write_slots].set(ins_w)
            eva2 = eva2.at[write_slots].set(ins_v)
            eva2 = eva2.at[-1].set(0)  # trash slot never live

            p, r, rounds, pushes, epushes = push_loop(p, r, deg2, egl2, eog2, eva2)
            return p, r, rounds, pushes, epushes, deg2, egl2, eog2, eva2

        return slide

    # ------------------------------------------------------------------
    def _build_reverse_slide(self, smap, push_loop):
        dtype = self.dtype
        n_pad = self.n_pad
        alpha_f = self.cfg.alpha
        spec_state, spec_row, rep = self.state_spec, self.row_spec, P()

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5))
        @functools.partial(
            smap,
            in_specs=(spec_state, spec_state, spec_row) + (spec_row,) * 12,
            out_specs=(spec_state, spec_state, rep, rep, rep) + (spec_row,) * 4,
        )
        def slide(
            p, r, deg, egl, eog, eva,
            del_u, del_v, ins_u, ins_v,               # by-SRC-owner (deg/k updates)
            clear_slots, write_slots,                  # by-DST-owner slot ops
            write_dl, write_sg, write_v,               # new edges: dst local, src global
        ):
            # Row sums before/after the slide fuse into ONE stacked
            # psum_scatter — see reverse_corrections.
            p, r, d_new, egl2, eog2, eva2 = reverse_corrections(
                p, r, deg, egl, eog, eva,
                del_u, del_v, ins_u, ins_v,
                clear_slots, write_slots, write_dl, write_sg, write_v,
                alpha_f, dtype, n_pad,
            )
            p, r, rounds, pushes, epushes = push_loop(p, r, d_new, egl2, eog2, eva2)
            return p, r, rounds, pushes, epushes, d_new, egl2, eog2, eva2

        return slide

    # ------------------------------------------------------------------
    def init_state(self, queries) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Global [N_pad, S] p/r arrays, r one-hot at the query vertices."""
        queries = np.asarray(queries, dtype=np.int64)
        p = np.zeros((self.n_pad, self.s_total), np.float64)
        r = np.zeros((self.n_pad, self.s_total), np.float64)
        r[queries, np.arange(queries.size)] = 1.0
        sh = NamedSharding(self.mesh, self.state_spec)
        return (
            jax.device_put(jnp.asarray(p.astype(self.dtype)), sh),
            jax.device_put(jnp.asarray(r.astype(self.dtype)), sh),
        )

    def device_graph(self, src, dst):
        """Partition window edges + degrees onto the mesh. Returns
        (deg, gather_local, other_global, valid, host_counts)."""
        by = "src" if self.mode == FORWARD else "dst"
        part = partition_edges(src, dst, self.n_local, self.n_rows, self.ecap, by)
        deg = np.bincount(np.asarray(src, np.int64), minlength=self.n_pad).astype(
            np.int32
        )[: self.n_pad]
        rsh = NamedSharding(self.mesh, self.row_spec)
        return (
            jax.device_put(jnp.asarray(deg), rsh),
            jax.device_put(jnp.asarray(part.gather_local), rsh),
            jax.device_put(jnp.asarray(part.other_global), rsh),
            jax.device_put(jnp.asarray(part.valid), rsh),
            part.counts,
        )

    def push(self, p, r, deg, egl, eog, eva):
        """Push to convergence; returns (p, r, rounds, pushes, edge_pushes)."""
        return self._push(p, r, deg, egl, eog, eva)

    def slide(self, p, r, deg, egl, eog, eva, *batches):
        """One window slide (see mode-specific signature in the builders)."""
        return self._slide(p, r, deg, egl, eog, eva, *batches)
