"""Headline benchmark: sustained edge-update throughput of the dynamic PPR
engine on a sliding-window power-law stream (the reference's headline
workload, SURVEY.md §3.2 / BASELINE.md).

Metric: edge updates/s — insertions + deletions applied per second while
maintaining eps-fresh multi-source PPR for S=128 query sources (each slide
of b edges performs b insertions at the head and b deletions at the tail =
2b updates, each with its invariant-exact residual correction, followed by
push-to-convergence to eps=1e-6). Also reported inside the JSON line:
pushes/s/chip (edge pushes executed per second) and top-100 retrieval
precision vs exact PPR on the final window (the BASELINE.json metric trio).

Timing protocol: the timed block (8 slides, one hard sync) runs
PPRX_BENCH_REPS times (default 3) over the SAME stream segment — driver
state (p/r, snapshot, counters, host mirrors) is snapshotted before the
first block and restored between blocks, so per-block device work is
bit-identical and the BEST block isolates the shared tunneled transport's
noise (measured at up to 3x wall-clock spread on identical programs;
PERFORMANCE.md round 3 "transport noise"). The JSON carries all block
throughputs so the spread is visible.

Precision: maintained state at eps=1e-6 is refined AT RETRIEVAL TIME to
eps_retrieve (PPRX_BENCH_EPS_R, default 5e-8) before the top-100 read —
the push invariant is preserved by refinement, maintenance stays at
eps=1e-6, and the one-off refine cost is reported as refine_ms.
Rationale + calibration: PERFORMANCE.md round 3 (top-k tail scores shrink
like 1/N while push error stays O(eps); at N=200k, eps=1e-6 alone gives
~0.82 precision; refinement restores 0.953 at 1e-7, 0.977 at 5e-8,
0.988 at 2e-8). Sampled over 16 queries.

vs_baseline: ratio against 1e6 updates/s — the recalled order of magnitude
of the reference's single-GPU dynamic-update throughput (BASELINE.md
[paper, approx.]; the reference mount was empty, no published number could
be extracted). The driver-specified north star is 10M/s on a 16-chip v5e
pod (BASELINE.json), i.e. ~0.625M/s/chip equivalent.

Defaults (see BASELINE.md round-3 notes for the tuning data): N=200k
vertices, W=2M window, b=160k slide, S=128 sources. The slide size is a
workload parameter (the reference's own batched mode); per-update work is
identical at any b — every update gets its exact correction and the state
is eps-fresh after every slide. Override via env:
  PPRX_BENCH_N, PPRX_BENCH_W, PPRX_BENCH_B, PPRX_BENCH_S,
  PPRX_BENCH_STEPS, PPRX_BENCH_REPS, PPRX_BENCH_ENGINE (fast|hybrid|dense),
  PPRX_BENCH_GRAPH (packed .npz stream instead of synthetic),
  PPRX_BENCH_BF16 (default 0 since round 4: the HEADLINE number is the
    invariant-exact f32 path, matching the library default and the
    engines' opt-in convention — advisor round-3 finding. bf16 dense-round
    DELIVERY (residual removal and thresholds stay exact f32; delivered
    increments carry 2^-9-relative rounding; +15% throughput, precision
    unchanged, L1 far inside the eps*E bound) is still MEASURED in the
    same run and reported as bf16_updates_per_sec unless
    PPRX_BENCH_DUAL=0),
  PPRX_BENCH_EPS_R (retrieval refinement eps; "0" disables refinement),
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

    from pprx.bench.run import _stream
    from pprx.config import PprConfig, StreamConfig
    from pprx.eval.sync import hard_sync
    from pprx.graph.fast_stream import FastStreamDriver
    from pprx.graph.hybrid_stream import HybridStreamDriver
    from pprx.graph.stream import StreamDriver

    n = int(os.environ.get("PPRX_BENCH_N", 200_000))
    w = int(os.environ.get("PPRX_BENCH_W", 2_000_000))
    b = int(os.environ.get("PPRX_BENCH_B", 160_000))
    s = int(os.environ.get("PPRX_BENCH_S", 128))
    steps = int(os.environ.get("PPRX_BENCH_STEPS", 8))
    reps = int(os.environ.get("PPRX_BENCH_REPS", 3))
    engine = os.environ.get("PPRX_BENCH_ENGINE", "fast")
    graph = os.environ.get("PPRX_BENCH_GRAPH") or None
    segsum = os.environ.get("PPRX_BENCH_SEGSUM")  # "0"/"1"; default auto
    if segsum is not None and segsum not in ("0", "1"):
        raise SystemExit(f"PPRX_BENCH_SEGSUM must be '0' or '1', got {segsum!r}")
    segsum = None if segsum is None else segsum == "1"
    bf16d = os.environ.get("PPRX_BENCH_BF16", "0") == "1"
    dual = os.environ.get("PPRX_BENCH_DUAL", "1") == "1"
    eps_r = float(os.environ.get("PPRX_BENCH_EPS_R", 5e-8))
    rebuild_every = max(1, min(8, w // (6 * b)))

    # warm past the first snapshot rebuild so the timed region holds only
    # steady-state slides (amortized rebuilds included via >= 2 rebuilds in
    # the timed region) with no first-use compiles
    warmup = rebuild_every + 2
    stream_len = w + (steps + warmup + 1) * b
    src, dst, n = _stream(graph, n, stream_len, seed=7)
    cfg = PprConfig(alpha=0.15, eps=1e-6, max_rounds=2000)
    scfg = StreamConfig(window=w, slide=b)
    queries = list(range(s))
    if engine == "fast":
        drv = FastStreamDriver(
            src, dst, n, queries, cfg, scfg, mode=0, dtype=jnp.float32,
            rebuild_every=rebuild_every, segsum=segsum, bf16d=bf16d,
        )
    elif engine == "hybrid":
        drv = HybridStreamDriver(src, dst, n, queries, cfg, scfg, mode=0)
    else:
        drv = StreamDriver(src, dst, n, queries, cfg, scfg, mode=0)

    drv.seed()
    for _ in drv.run(warmup):
        pass
    hard_sync(drv.state.r)

    # every block re-runs the SAME stream segment (state/graph/counters are
    # snapshotted and restored between blocks), so per-block device work is
    # bit-identical and max-over-blocks isolates transport noise without
    # conflating workload variance across segments
    def snapshot():
        return (
            jax.tree_util.tree_map(jnp.array, (drv.state, drv.graph)),
            drv.fcnt, drv.head, drv.step_idx,
            drv.hsrc.copy(), drv.hdst.copy(),
        )

    def restore(snap):
        st_kg, drv.fcnt, drv.head, drv.step_idx, hs, hd = snap
        # fresh copies: the slide step donates its inputs
        drv.state, drv.graph = jax.tree_util.tree_map(jnp.array, st_kg)
        drv.hsrc, drv.hdst = hs.copy(), hd.copy()

    multi = reps > 1 and engine == "fast" and drv.steps_available >= steps
    snap0 = snapshot() if multi else None
    blocks = []
    best = None
    for rep in range(reps if multi else 1):
        if multi and rep > 0:
            restore(snap0)
        t0 = time.perf_counter()
        stats = list(drv.run(steps))
        hard_sync(drv.state.r)
        wall = time.perf_counter() - t0
        ups = 2 * b * len(stats) / wall
        blocks.append(round(ups, 1))
        if best is None or ups > best[0]:
            best = (ups, wall, stats)
    ups, wall, stats = best
    pushes = sum(float(st.edge_pushes) for st in stats)

    # the OTHER delivery mode, measured in the same process over the same
    # segment (a fresh driver: bf16d is baked into the compiled programs)
    other_ups = None
    if dual and engine == "fast" and multi:
        drv2 = FastStreamDriver(
            src, dst, n, queries, cfg, scfg, mode=0, dtype=jnp.float32,
            rebuild_every=rebuild_every, segsum=segsum, bf16d=not bf16d,
        )
        drv2.seed()
        for _ in drv2.run(warmup):
            pass
        hard_sync(drv2.state.r)
        other_blocks = []
        for _ in range(2):
            t0 = time.perf_counter()
            st2 = list(drv2.run(steps))
            hard_sync(drv2.state.r)
            other_blocks.append(2 * b * len(st2) / (time.perf_counter() - t0))
            if drv2.steps_available < steps:
                break
        other_ups = max(other_blocks) if other_blocks else None

    precision = None
    refine_ms = None
    if os.environ.get("PPRX_BENCH_PRECISION", "1") == "1":
        # untimed accuracy check: top-100 retrieval precision vs exact PPR
        # on the final window for 16 sampled queries (BASELINE metric trio)
        from pprx.eval.metrics import precision_at_k
        from pprx.ref.exact import exact_ppr

        if eps_r and eps_r < cfg.eps and hasattr(drv, "refine"):
            # run refine twice from the same state: the first call carries
            # the one-off XLA compile (different eps => different program),
            # the second is the steady serving cost reported as refine_ms
            from pprx.engine.state import PprState

            p0 = jnp.array(drv.state.p, copy=True)
            r0 = jnp.array(drv.state.r, copy=True)
            drv.refine(eps_r)
            hard_sync(drv.state.r)
            drv.state = PprState(p=p0, r=r0, mode=drv.state.mode)
            t0 = time.perf_counter()
            drv.refine(eps_r)
            hard_sync(drv.state.r)
            refine_ms = round((time.perf_counter() - t0) * 1e3, 1)

        head, k = drv.head, 100
        wsrc = np.asarray(drv.hsrc if hasattr(drv, "hsrc") else src[head - w : head])
        wdst = np.asarray(drv.hdst if hasattr(drv, "hdst") else dst[head - w : head])
        p = np.asarray(drv.state.p)
        precs, l1s = [], []
        for si in np.linspace(0, s - 1, 16).astype(int):
            pi = exact_ppr(wsrc, wdst, n, queries[si], cfg.alpha, tol=1e-10)
            pred = np.argsort(-p[:n, si], kind="stable")[:k]
            precs.append(precision_at_k(pred, pi, k))
            l1s.append(float(np.abs(p[:n, si] - pi).sum()))
        precision = float(np.mean(precs))
        l1_mean = float(np.mean(l1s))

    out = {
        "metric": "edge_updates_per_sec",
        "value": round(ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(ups / 1e6, 3),
        "pushes_per_sec_per_chip": round(pushes / wall, 1),
        "top100_precision": precision,
        "l1_vs_exact_mean": round(l1_mean, 6) if precision is not None else None,
        "l1_bound_eps_E": 1e-6 * w,
        "bf16_delivery": bf16d,
        ("f32_updates_per_sec" if bf16d else "bf16_updates_per_sec"): (
            round(other_ups, 1) if other_ups else None
        ),
        "refine_ms": refine_ms,
        "eps_retrieve": eps_r if refine_ms is not None else None,
        "blocks": blocks,
        "blocks_median": round(float(np.median(blocks)), 1),
        "config": {"n": n, "window": w, "slide": b, "sources": s,
                   "eps": 1e-6, "alpha": 0.15, "engine": engine,
                   "graph": graph},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
