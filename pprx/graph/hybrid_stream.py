"""Sliding-window driver on the hybrid (snapshot+overlay) sparse engine.

Same contract as pprx.graph.stream.StreamDriver, but each slide's
push-to-convergence uses frontier-sparse rounds (pprx.engine.sparse) — the
steady-state frontier after a slide is tiny, so this is the fast path for
the headline updates/s workload. The CSR snapshot is re-sorted every
``rebuild_every`` slides (amortized O(W log W) on device); between rebuilds
the slide appends its 2b edge changes to the signed overlay.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig, StreamConfig
from pprx.engine.sparse import HybridGraph, push_to_convergence_hybrid, rebuild_snapshot
from pprx.engine.state import FORWARD, PprState, PushStats, init_state
from pprx.engine.update import apply_edge_batch
from pprx.graph.dynamic import WindowGraph


@functools.partial(
    jax.jit, static_argnames=("cfg", "fcap", "ecap"), donate_argnums=(0, 1)
)
def hybrid_slide_step(
    state: PprState,
    graph: HybridGraph,
    new_src: jnp.ndarray,
    new_dst: jnp.ndarray,
    slots: jnp.ndarray,
    ov_count: jnp.ndarray,
    cfg: PprConfig,
    fcap: int,
    ecap: int,
) -> tuple[PprState, HybridGraph, PushStats]:
    w = graph.window
    old_src = w.src[slots]
    old_dst = w.dst[slots]
    state, w = apply_edge_batch(state, w, new_src, new_dst, old_src, old_dst, cfg)
    # overlay: expirations (-1) then insertions (+1) at [ov_count, ov_count+2b)
    b = new_src.shape[0]
    ov = graph.ov
    seg_src = jnp.concatenate([old_src, new_src])
    seg_dst = jnp.concatenate([old_dst, new_dst])
    seg_sign = jnp.concatenate(
        [jnp.full(b, -1, jnp.int32), jnp.full(b, 1, jnp.int32)]
    )
    ov = ov.replace(
        src=jax.lax.dynamic_update_slice(ov.src, seg_src, (ov_count,)),
        dst=jax.lax.dynamic_update_slice(ov.dst, seg_dst, (ov_count,)),
        sign=jax.lax.dynamic_update_slice(ov.sign, seg_sign, (ov_count,)),
    )
    w = w.replace(
        src=w.src.at[slots].set(new_src),
        dst=w.dst.at[slots].set(new_dst),
    )
    graph = graph.replace(window=w, ov=ov)
    state, stats = push_to_convergence_hybrid(state, graph, cfg, fcap, ecap)
    return state, graph, stats


_rebuild_jit = jax.jit(rebuild_snapshot, static_argnames=("mode",))


class HybridStreamDriver:
    def __init__(
        self,
        stream_src: np.ndarray,
        stream_dst: np.ndarray,
        n: int,
        queries,
        cfg: PprConfig,
        scfg: StreamConfig,
        mode: int = FORWARD,
        dtype=jnp.float32,
        rebuild_every: int = 16,
        fcap: int | None = None,
        ecap: int | None = None,
    ):
        if stream_src.shape[0] < scfg.window:
            raise ValueError("stream shorter than one window")
        self.stream_src = np.asarray(stream_src, dtype=np.int32)
        self.stream_dst = np.asarray(stream_dst, dtype=np.int32)
        self.n = n
        self.cfg = cfg
        self.scfg = scfg
        self.mode = mode
        w = scfg.window
        window = WindowGraph.from_coo(self.stream_src[:w], self.stream_dst[:w], n, capacity=w)
        overlay_cap = 2 * scfg.slide * rebuild_every
        self.graph = HybridGraph.build(window, mode, overlay_cap)
        self.state = init_state(n, queries, mode=mode, dtype=dtype)
        self.fcap = fcap if fcap is not None else n + 1
        # steady-state frontier edges after a slide scale with the batch, not
        # the window (measured ~4x slide on power-law streams); oversize
        # frontiers fall back to the dense round anyway.
        self.ecap = ecap if ecap is not None else min(max(4 * scfg.slide, 16_384), w)
        self.rebuild_every = rebuild_every
        self.ov_count = 0
        self.head = w
        self.step_idx = 0

    def seed(self) -> PushStats:
        self.state, stats = jax.jit(
            push_to_convergence_hybrid,
            static_argnames=("cfg", "fcap", "ecap"),
            donate_argnums=(0,),
        )(self.state, self.graph, cfg=self.cfg, fcap=self.fcap, ecap=self.ecap)
        return stats

    @property
    def steps_available(self) -> int:
        return (self.stream_src.shape[0] - self.head) // self.scfg.slide

    def run(self, n_steps: int | None = None) -> Iterator[PushStats]:
        b = self.scfg.slide
        w = self.scfg.window
        total = self.steps_available if n_steps is None else n_steps
        for _ in range(total):
            if self.head + b > self.stream_src.shape[0]:
                return
            if self.ov_count + 2 * b > self.graph.ov.src.shape[0]:
                self.graph = _rebuild_jit(self.graph, mode=self.mode)
                self.ov_count = 0
            new_src = jnp.asarray(self.stream_src[self.head : self.head + b])
            new_dst = jnp.asarray(self.stream_dst[self.head : self.head + b])
            slots = jnp.asarray(
                (np.arange(self.head, self.head + b) % w).astype(np.int32)
            )
            self.state, self.graph, stats = hybrid_slide_step(
                self.state,
                self.graph,
                new_src,
                new_dst,
                slots,
                jnp.asarray(self.ov_count, jnp.int32),
                cfg=self.cfg,
                fcap=self.fcap,
                ecap=self.ecap,
            )
            self.ov_count += 2 * b
            self.head += b
            self.step_idx += 1
            yield stats
