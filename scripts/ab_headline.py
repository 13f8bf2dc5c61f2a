"""Interleaved same-process A/B of the headline stream bench (bench.py
shapes: N=200k, W=2M, b=160k, S=128) across the two suspects for the
746k-vs-606k discrepancy (VERDICT round 2, weak item 1):

- segsum on/off (the Pallas MXU segment-sum in dense scan rounds)
- rebuild_every 2 vs 8 (bench.py derives 2 at b=160k; the round-2 sweeps
  that recorded 746k ran the driver default of 8)

Protocol per PERFORMANCE.md measurement traps: one process, every variant
run twice interleaved, first pass discarded (compile/cache warm), timing
bracketed by hard_sync. Drivers are rebuilt fresh per run and dropped
after (HBM hygiene).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/pprx-xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pprx.config import PprConfig, StreamConfig
from pprx.eval.sync import hard_sync
from pprx.graph.fast_stream import FastStreamDriver
from pprx.graph.io import synthetic_powerlaw_stream

N = int(os.environ.get("AB_N", 200_000))
W = int(os.environ.get("AB_W", 2_000_000))
B = int(os.environ.get("AB_B", 160_000))
S = int(os.environ.get("AB_S", 128))
STEPS = int(os.environ.get("AB_STEPS", 8))

import json

_default_variants = [
    ("segsum=1 re=2", dict(segsum=True, rebuild_every=2)),
    ("segsum=0 re=2", dict(segsum=False, rebuild_every=2)),
    ("segsum=1 re=8", dict(segsum=True, rebuild_every=8)),
    ("segsum=0 re=8", dict(segsum=False, rebuild_every=8)),
]
# override via AB_VARIANTS: JSON list of kwarg dicts for FastStreamDriver
_env = os.environ.get("AB_VARIANTS")
if _env:
    VARIANTS = [
        (" ".join(f"{k}={v}" for k, v in kw.items()), kw)
        for kw in json.loads(_env)
    ]
else:
    VARIANTS = _default_variants

cfg = PprConfig(alpha=0.15, eps=1e-6, max_rounds=2000)
scfg = StreamConfig(window=W, slide=B)
max_warm = max(kw.get("rebuild_every", 8) for _, kw in VARIANTS) + 2
stream_len = W + (STEPS + max_warm + 1) * B
src, dst, _ = synthetic_powerlaw_stream(N, stream_len, seed=7)
queries = list(range(S))


def run_once(kw):
    drv = FastStreamDriver(src, dst, N, queries, cfg, scfg, mode=0,
                           dtype=jnp.float32, **kw)
    drv.seed()
    warm = kw.get("rebuild_every", 8) + 2
    for _ in drv.run(warm):
        pass
    hard_sync(drv.state.r)
    t0 = time.perf_counter()
    stats = list(drv.run(STEPS))
    hard_sync(drv.state.r)
    wall = time.perf_counter() - t0
    ups = 2 * B * len(stats) / wall
    rounds = sum(int(st.rounds) for st in stats)
    wl = sum(int(st.wl_rounds) for st in stats)
    del drv
    return ups, wall, rounds, wl


for pass_i in range(int(os.environ.get("AB_PASSES", 2))):
    for name, kw in VARIANTS:
        ups, wall, rounds, wl = run_once(kw)
        tag = "WARM" if pass_i == 0 else f"MEAS{pass_i}"
        print(f"[{tag}] {name}: {ups/1e3:8.1f}k updates/s  wall={wall:6.3f}s  "
              f"rounds={rounds} wl={wl}", flush=True)
