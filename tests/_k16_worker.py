"""Worker: wl/wlp push parity at a large shard count K (VERDICT round-2
item 8 — the 8-device conftest mesh can't exercise K=16/32). Run with
XLA_FLAGS=--xla_force_host_platform_device_count=<K> JAX_PLATFORMS=cpu.
Usage: _k16_worker.py <K>"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig
from pprx.dist.mesh import make_row_mesh
from pprx.dist.wl import ShardedWlEngine
from pprx.engine.push import push_to_convergence
from pprx.engine.state import FORWARD, init_state
from pprx.graph.dynamic import WindowGraph

K = int(sys.argv[1])
CFG = PprConfig(alpha=0.15, eps=1e-8, max_rounds=10_000)

rng = np.random.default_rng(0)
n, m = 4 * K * 16, 4 * K * 96
src = rng.integers(0, n, m).astype(np.int32)
dst = rng.integers(0, n, m).astype(np.int32)
queries = [0, 7, n // 2, n - 3]

graph = WindowGraph.from_coo(src, dst, n)
state = init_state(n, queries, mode=FORWARD, dtype=jnp.float64)
state, _ = push_to_convergence(state, graph, CFG)
p_ref = np.asarray(state.p)[:n]

mesh = make_row_mesh(K, 1)
for prop in (False, True):
    eng = ShardedWlEngine(
        mesh, n, len(queries), ecap=m, bcap=8, cfg=CFG, mode=FORWARD,
        dtype=jnp.float64, ccap=32, proportional=prop,
    )
    p, r = eng.init_state(queries)
    deg, egl, eog, eva, _, snap = eng.device_graph_wl(src, dst)
    p, r, rounds, pushes, epushes, wl = eng.push_wl(p, r, deg, snap)
    assert int(rounds) < CFG.max_rounds, f"K={K} prop={prop} did not converge"
    np.testing.assert_allclose(np.asarray(p)[:n], p_ref, atol=1e-11)
    print(f"OK K={K} prop={prop} rounds={int(rounds)} wl={int(wl)}", flush=True)
print("ALL-OK", flush=True)
