"""Headline benchmark: sustained edge-update throughput of the dynamic PPR
engine on a sliding-window power-law stream (the reference's headline
workload, SURVEY.md §3.2 / BASELINE.md).

Metric: edge updates/s — insertions + deletions applied per second while
maintaining eps-fresh multi-source PPR (each slide of b edges performs b
insertions at the head and b deletions at the tail = 2b updates, each with
its invariant-exact residual correction, followed by push-to-convergence).

vs_baseline: ratio against 1e6 updates/s — the recalled order of magnitude
of the reference's single-GPU dynamic-update throughput (BASELINE.md
[paper, approx.]; the reference mount was empty, no published number could
be extracted). The driver-specified north star is 10M/s on a 16-chip v5e
pod (BASELINE.json), i.e. ~0.625M/s/chip equivalent.

Run on the real TPU: do NOT set JAX_PLATFORMS=cpu. Scale via env:
  PPRX_BENCH_N (vertices), PPRX_BENCH_W (window), PPRX_BENCH_B (slide),
  PPRX_BENCH_S (query sources), PPRX_BENCH_STEPS (timed steps).
"""

import json
import os
import time

import numpy as np



def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/pprx-xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pprx.config import PprConfig, StreamConfig
    from pprx.graph.hybrid_stream import HybridStreamDriver
    from pprx.graph.io import synthetic_powerlaw_stream
    from pprx.graph.stream import StreamDriver

    n = int(os.environ.get("PPRX_BENCH_N", 200_000))
    w = int(os.environ.get("PPRX_BENCH_W", 2_000_000))
    b = int(os.environ.get("PPRX_BENCH_B", 20_000))
    # S=16 measured fastest for raw updates/s on this transport (S=128
    # serves 8x the queries at ~0.7x the updates/s — see PERFORMANCE.md).
    s = int(os.environ.get("PPRX_BENCH_S", 16))
    steps = int(os.environ.get("PPRX_BENCH_STEPS", 20))
    engine = os.environ.get("PPRX_BENCH_ENGINE", "hybrid")
    # warm past the first snapshot rebuild (slide rebuild_every+1) so the
    # timed region holds only steady-state slides with no first-use compiles
    warmup = 5

    stream_len = w + (steps + warmup + 1) * b
    src, dst, _ = synthetic_powerlaw_stream(n, stream_len, seed=7)
    cfg = PprConfig(alpha=0.15, eps=1e-6, max_rounds=2000)
    scfg = StreamConfig(window=w, slide=b)
    if engine == "hybrid":
        drv = HybridStreamDriver(
            src, dst, n, list(range(s)), cfg, scfg, mode=0, dtype=jnp.float32
        )
    else:
        drv = StreamDriver(
            src, dst, n, list(range(s)), cfg, scfg, mode=0, dtype=jnp.float32
        )
    from pprx.eval.sync import hard_sync

    drv.seed()
    for _ in drv.run(warmup):
        pass
    hard_sync(drv.state.r)

    t0 = time.perf_counter()
    stats = list(drv.run(steps))
    hard_sync(drv.state.r)
    wall = time.perf_counter() - t0

    updates = 2 * b * len(stats)
    ups = updates / wall
    print(
        json.dumps(
            {
                "metric": "edge_updates_per_sec",
                "value": round(ups, 1),
                "unit": "updates/s",
                "vs_baseline": round(ups / 1e6, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
