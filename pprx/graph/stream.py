"""Sliding-window stream driver.

Reference counterpart (SURVEY.md §2.1 "CLI binaries" L4 + §3.2): the host
loop that slides the window one batch per step — insert b edges at the head,
delete the b expiring edges at the tail — then restores the invariant and
re-pushes to convergence. One step is ONE jitted call with donated buffers
(state + graph never round-trip to host); the expiring edges are read from
the circular buffer slots that the new edges overwrite.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig, StreamConfig
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, PprState, PushStats, init_state
from pprx.engine.update import apply_edge_batch
from pprx.graph.dynamic import WindowGraph


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def slide_step(
    state: PprState,
    graph: WindowGraph,
    new_src: jnp.ndarray,
    new_dst: jnp.ndarray,
    slots: jnp.ndarray,
    cfg: PprConfig,
) -> tuple[PprState, WindowGraph, PushStats]:
    """One window slide: delete expiring edges at ``slots``, insert the new
    ones there, correct the state, push to convergence. Fully on-device."""
    old_src = graph.src[slots]
    old_dst = graph.dst[slots]
    state, graph = apply_edge_batch(
        state, graph, new_src, new_dst, old_src, old_dst, cfg
    )
    graph = graph.replace(
        src=graph.src.at[slots].set(new_src),
        dst=graph.dst.at[slots].set(new_dst),
    )
    state, stats = push_to_convergence(state, graph, cfg)
    return state, graph, stats


_seed_jit = jax.jit(push_to_convergence, static_argnames=("cfg",), donate_argnums=(0,))


class StreamDriver:
    """Host orchestration of the jitted slide steps (SURVEY.md L4).

    Holds the full timestamped stream in host memory; the device holds only
    the live window + PPR state. ``queries`` selects the batched query
    vertices (sources in forward mode, targets in reverse mode).
    """

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
        self.graph = WindowGraph.from_coo(
            self.stream_src[:w], self.stream_dst[:w], n, capacity=w
        )
        self.state = init_state(n, queries, mode=mode, dtype=dtype)
        self.head = w  # next stream position to insert
        self.step_idx = 0

    def seed(self) -> PushStats:
        """Static push on the initial window (SURVEY.md §3.2 'seed p,r')."""
        self.state, stats = _seed_jit(self.state, self.graph, cfg=self.cfg)
        return stats

    @property
    def steps_available(self) -> int:
        return (self.stream_src.shape[0] - self.head) // self.scfg.slide

    def run(self, n_steps: int | None = None) -> Iterator[PushStats]:
        """Slide the window ``n_steps`` times (default: until stream ends)."""
        b = self.scfg.slide
        w = self.scfg.window
        total = self.steps_available if n_steps is None else n_steps
        for _ in range(total):
            if self.head + b > self.stream_src.shape[0]:
                return
            new_src = jnp.asarray(self.stream_src[self.head : self.head + b])
            new_dst = jnp.asarray(self.stream_dst[self.head : self.head + b])
            slots = jnp.asarray(
                (np.arange(self.head, self.head + b) % w).astype(np.int32)
            )
            self.state, self.graph, stats = slide_step(
                self.state, self.graph, new_src, new_dst, slots, cfg=self.cfg
            )
            self.head += b
            self.step_idx += 1
            yield stats
