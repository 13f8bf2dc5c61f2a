"""Config-4 serving head: sweep lax.approx_max_k's recall_target knob
(VERDICT round-3 item 3 — the <10 ms @ recall>=0.95 head).

Round 3 swept k-overfetch (k=256 -> 32 ms) but never the op's own
recall_target parameter, which sizes the binned reduction directly.
Shapes: N=500k, E=5M, S=512 sources, k=100, serving from maintained state.
Reports latency + true recall@100 vs the exact head for each point, plus
overfetch+rerank combos (approx(k', rt) -> exact top-100 of candidates).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/pprx-xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pprx.config import PprConfig
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, init_state
from pprx.eval.sync import hard_sync
from pprx.graph.dynamic import WindowGraph
from pprx.graph.io import synthetic_powerlaw_stream
from pprx.retrieve.topk import topk_candidates

n, m, s, k = 500_000, 5_000_000, 512, 100
src, dst, _ = synthetic_powerlaw_stream(n, m, seed=4)
cfg = PprConfig(alpha=0.15, eps=1e-6, max_rounds=2000)
rng = np.random.default_rng(0)
queries = rng.integers(0, n, size=s).tolist()
graph = WindowGraph.from_coo(src, dst, n)
state = init_state(n, queries, mode=FORWARD)
t0 = time.perf_counter()
state, stats = jax.jit(push_to_convergence, static_argnames=("cfg",))(
    state, graph, cfg=cfg
)
hard_sync(state.p)
print(f"push: {time.perf_counter()-t0:.1f}s, {int(stats.rounds)} rounds", flush=True)


@functools.partial(jax.jit, static_argnames=("kk", "rt"))
def approx_head(p, kk, rt):
    return jax.lax.approx_max_k(p[:-1].T, kk, recall_target=rt)


@functools.partial(jax.jit, static_argnames=("kk", "rt"))
def overfetch_head(p, kk, rt):
    sc, ids = jax.lax.approx_max_k(p[:-1].T, kk, recall_target=rt)
    sc2, ij = jax.lax.top_k(sc, k)
    return sc2, jnp.take_along_axis(ids, ij, axis=1)


def lat(fn, reps=20):
    sc, ids = fn(state.p)
    hard_sync(ids)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            sc, ids = fn(state.p)
        hard_sync(ids)
        ms = (time.perf_counter() - t0) / reps * 1e3
        best = ms if best is None else min(best, ms)
    return best, np.asarray(ids)


# exact reference (offline head)
_, ids_ex = lat(lambda p: topk_candidates(p, k=k, exact=True, chunk=2048), reps=2)
ex_sets = [set(ids_ex[i].tolist()) for i in range(s)]
p_host = np.asarray(state.p[:-1])


def recall(ids):
    """Plain set recall vs one arbitrary tie-breaking of the exact head —
    WRONG on power-law tails (saturates ~0.91 at any effort because a mean
    of ~17k vertices tie at the k-th score); kept to document the gap."""
    return float(np.mean([
        len(ex_sets[i] & set(ids[i, :k].tolist())) / k for i in range(s)
    ]))


def tie_recall(ids):
    from pprx.eval.metrics import recall_at_k_ties

    return float(np.mean([
        recall_at_k_ties(ids[i], p_host[:, i], k) for i in range(s)
    ]))


for rt in (0.95, 0.96, 0.97, 0.98, 0.99):
    ms, ids = lat(lambda p, rt=rt: approx_head(p, k, rt))
    print(f"approx k=100 rt={rt}: {ms:6.2f} ms  set-recall={recall(ids):.4f}  "
          f"tie-recall={tie_recall(ids):.4f}", flush=True)

for kk, rt in ((128, 0.95), (128, 0.97), (192, 0.95)):
    ms, ids = lat(lambda p, kk=kk, rt=rt: overfetch_head(p, kk, rt))
    print(f"overfetch k'={kk} rt={rt}: {ms:6.2f} ms  set-recall={recall(ids):.4f}  "
          f"tie-recall={tie_recall(ids):.4f}", flush=True)
