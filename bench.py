"""Headline benchmark: sustained edge-update throughput of the dynamic PPR
engine on a sliding-window power-law stream (the reference's headline
workload, SURVEY.md §3.2 / BASELINE.md).

Metric: edge updates/s — insertions + deletions applied per second while
maintaining eps-fresh multi-source PPR for S=128 query sources (each slide
of b edges performs b insertions at the head and b deletions at the tail =
2b updates, each with its invariant-exact residual correction, followed by
push-to-convergence to eps=1e-6). Also reported inside the JSON line:
pushes/s/chip (edge pushes executed per second) and top-100 retrieval
precision vs exact PPR on the final window for sampled queries (the
BASELINE.json metric trio).

vs_baseline: ratio against 1e6 updates/s — the recalled order of magnitude
of the reference's single-GPU dynamic-update throughput (BASELINE.md
[paper, approx.]; the reference mount was empty, no published number could
be extracted). The driver-specified north star is 10M/s on a 16-chip v5e
pod (BASELINE.json), i.e. ~0.625M/s/chip equivalent.

Defaults (see BASELINE.md round-2 notes for the tuning data): N=200k
vertices, W=2M window, b=160k slide, S=128 sources. The slide size is a
workload parameter (the reference's own batched mode); per-update work is
identical at any b — every update gets its exact correction and the state
is eps-fresh after every slide. Override via env:
  PPRX_BENCH_N, PPRX_BENCH_W, PPRX_BENCH_B, PPRX_BENCH_S,
  PPRX_BENCH_STEPS, PPRX_BENCH_ENGINE (fast|hybrid|dense),
  PPRX_BENCH_PRECISION=0 to skip the (untimed) exact-PPR precision check.

Run on the real TPU: do NOT set JAX_PLATFORMS=cpu.
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
    from pprx.eval.sync import hard_sync
    from pprx.graph.fast_stream import FastStreamDriver
    from pprx.graph.hybrid_stream import HybridStreamDriver
    from pprx.graph.io import synthetic_powerlaw_stream
    from pprx.graph.stream import StreamDriver

    n = int(os.environ.get("PPRX_BENCH_N", 200_000))
    w = int(os.environ.get("PPRX_BENCH_W", 2_000_000))
    b = int(os.environ.get("PPRX_BENCH_B", 160_000))
    s = int(os.environ.get("PPRX_BENCH_S", 128))
    steps = int(os.environ.get("PPRX_BENCH_STEPS", 8))
    engine = os.environ.get("PPRX_BENCH_ENGINE", "fast")
    segsum = os.environ.get("PPRX_BENCH_SEGSUM")  # "0"/"1"; default auto
    if segsum is not None and segsum not in ("0", "1"):
        raise SystemExit(f"PPRX_BENCH_SEGSUM must be '0' or '1', got {segsum!r}")
    segsum = None if segsum is None else segsum == "1"
    rebuild_every = max(1, min(8, w // (6 * b)))

    # warm past the first snapshot rebuild so the timed region holds only
    # steady-state slides (amortized rebuilds included via >= 2 rebuilds in
    # the timed region) with no first-use compiles
    warmup = rebuild_every + 2
    stream_len = w + (steps + warmup + 1) * b
    src, dst, _ = synthetic_powerlaw_stream(n, stream_len, seed=7)
    cfg = PprConfig(alpha=0.15, eps=1e-6, max_rounds=2000)
    scfg = StreamConfig(window=w, slide=b)
    queries = list(range(s))
    if engine == "fast":
        drv = FastStreamDriver(
            src, dst, n, queries, cfg, scfg, mode=0, dtype=jnp.float32,
            rebuild_every=rebuild_every, segsum=segsum,
        )
    elif engine == "hybrid":
        drv = HybridStreamDriver(src, dst, n, queries, cfg, scfg, mode=0)
    else:
        drv = StreamDriver(src, dst, n, queries, cfg, scfg, mode=0)

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
    pushes = sum(float(st.edge_pushes) for st in stats)

    precision = None
    if os.environ.get("PPRX_BENCH_PRECISION", "1") == "1":
        # untimed accuracy check: top-100 retrieval precision vs exact PPR
        # on the final window for sampled queries (BASELINE metric trio)
        from pprx.eval.metrics import precision_at_k
        from pprx.ref.exact import exact_ppr

        head, k = drv.head, 100
        wsrc = np.asarray(drv.hsrc if hasattr(drv, "hsrc") else src[head - w : head])
        wdst = np.asarray(drv.hdst if hasattr(drv, "hdst") else dst[head - w : head])
        p = np.asarray(drv.state.p)
        precs = []
        for si in (0, s // 2, s - 1):
            pi = exact_ppr(wsrc, wdst, n, queries[si], cfg.alpha, tol=1e-9)
            pred = np.argsort(-p[:n, si], kind="stable")[:k]
            precs.append(precision_at_k(pred, pi, k))
        precision = float(np.mean(precs))

    out = {
        "metric": "edge_updates_per_sec",
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / 1e6, 3),
        "pushes_per_sec_per_chip": round(pushes / wall, 1),
        "top100_precision": precision,
        "config": {"n": n, "window": w, "slide": b, "sources": s,
                   "eps": 1e-6, "alpha": 0.15, "engine": engine},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
