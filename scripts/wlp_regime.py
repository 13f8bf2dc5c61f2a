"""Quantify the wl-vs-wlp regime (VERDICT round-3 item 5).

Runs both sharded engines on a virtual CPU mesh at K in {8, 16, 32} with
FIXED per-shard load (n_local, w_local, b_local constant), records measured
round mixes, and prints each engine's per-big-round device-work and
collective-byte PROXIES from the engine's own static configuration:

- wl dense-flush round: sweeps the whole per-shard window through the
  delivery views (no per-round sort) and reduce-scatters an [n_pad, S]
  accumulator — collective bytes grow with TOTAL N, independent of the
  frontier; per-device memory is O(n_pad * S).
- wlp top-tier round: sorts the per-shard frontier emission (up to
  ecap+fring lanes with an [L, S] payload) and ships 2*K*ccap_top*S*4
  bytes of a2a — collective bytes are O(frontier), independent of N;
  per-device push memory stays O(n_local * S + frontier).

Run each K in a subprocess (xla_force_host_platform_device_count must be
set before jax initializes).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from pprx.config import PprConfig, StreamConfig
from pprx.dist.mesh import make_row_mesh
from pprx.dist.stream import ShardedStreamDriver
from pprx.graph.io import synthetic_powerlaw_stream

K = int(sys.argv[1])
engine = sys.argv[2]
N_LOC, W_LOC, B_LOC, S = 4096, 16384, 512, 8
n, w, b = K * N_LOC, K * W_LOC, K * B_LOC
src, dst, _ = synthetic_powerlaw_stream(n, w + 8 * b, seed=4)
cfg = PprConfig(alpha=0.15, eps=1e-6, max_rounds=4000)
mesh = make_row_mesh(K, 1)
drv = ShardedStreamDriver(src, dst, n, list(range(S)), cfg,
                          StreamConfig(window=w, slide=b), mesh,
                          engine=engine)
eng = drv.eng
drv.seed()
t0 = time.perf_counter()
stats = [s for s in drv.run(4)]
wall = time.perf_counter() - t0
rounds = sum(s["rounds"] for s in stats)
wl_rounds = sum(s.get("wl_rounds", 0) for s in stats)
tiers = list(eng.tiers)
ccaps = list(eng.ccaps)
S_eff = S
top_L = tiers[-1][1] + tiers[-1][2]
out = {
    "K": K, "engine": engine,
    "rounds_4slides": rounds, "exchange_rounds": wl_rounds,
    "dense_or_drain_rounds": rounds - wl_rounds,
    "top_tier": tiers[-1], "ccap_top": ccaps[-1],
    "n_pad": eng.n_pad, "n_local": eng.n_local,
    # per-device proxies for one BIG round
    "big_round_sorted_lanes": top_L if engine == "wlp" else 0,
    "big_round_collective_MB": round(
        (2 * K * ccaps[-1] * S_eff * 4 if engine == "wlp"
         else eng.n_pad * S_eff * 4) / 1e6, 2),
    "per_device_state_MB": round(
        (eng.n_local if engine == "wlp" else eng.n_pad) * S_eff * 4 / 1e6, 2),
    "wall_s_cpu_coordbound": round(wall, 2),
}
print(json.dumps(out))
"""


def main():
    for K in (8, 16, 32):
        for engine in ("wl", "wlp"):
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={K}"
            ).strip()
            env["JAX_PLATFORMS"] = "cpu"
            r = subprocess.run(
                [sys.executable, "-c", WORKER % {"here": HERE}, str(K), engine],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(f"K={K} {engine} FAILED:\n{r.stderr[-2000:]}", flush=True)
                continue
            print(line[-1], flush=True)


if __name__ == "__main__":
    main()
