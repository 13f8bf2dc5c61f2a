"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_multiprocess.py). Each process owns one CPU device; the sharded
push runs over a 2x1 ('rows','srcs') mesh whose collectives cross the
process boundary (Gloo transport — the CPU stand-in for ICI/DCN). Each
process checks ITS OWN addressable shard of the result against a
single-device reference computed locally."""

import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from pprx.dist.init import init_distributed

    assert init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc

    import jax.numpy as jnp
    import numpy as np

    from pprx.config import PprConfig
    from pprx.dist.mesh import make_row_mesh
    from pprx.dist.sharded import ShardedEngine
    from pprx.engine.push import push_to_convergence
    from pprx.engine.state import FORWARD, init_state
    from pprx.graph.dynamic import WindowGraph
    from pprx.graph.io import synthetic_powerlaw_stream

    n, m = 60, 400
    src, dst, _ = synthetic_powerlaw_stream(n, m, seed=5)
    cfg = PprConfig(alpha=0.15, eps=1e-8, max_rounds=10_000)
    queries = [0, 7, 23, 41]
    mesh = make_row_mesh(nproc, 1)
    eng = ShardedEngine(
        mesh, n, len(queries), ecap=m, bcap=8, cfg=cfg, mode=FORWARD,
        dtype=jnp.float64,
    )
    p, r = eng.init_state(queries)
    deg, egl, eog, eva, _ = eng.device_graph(src, dst)
    p, r, rounds, pushes, epushes = eng.push(p, r, deg, egl, eog, eva)

    # single-device reference, computed independently in this process
    graph = WindowGraph.from_coo(src, dst, n)
    st = init_state(n, queries, mode=FORWARD, dtype=jnp.float64)
    st, stats = push_to_convergence(st, graph, cfg)
    ref_p = np.asarray(st.p)

    def check_local(arr, tag):
        shard = arr.addressable_shards[0]
        lo = shard.index[0].start or 0
        local = np.asarray(shard.data)
        ref_rows = ref_p[lo : lo + local.shape[0]]
        if ref_rows.shape[0] < local.shape[0]:  # padded tail rows are zero
            pad = np.zeros((local.shape[0] - ref_rows.shape[0], local.shape[1]))
            ref_rows = np.concatenate([ref_rows, pad])
        np.testing.assert_allclose(local, ref_rows, atol=1e-12, err_msg=tag)

    check_local(p, "dense")
    assert int(rounds) == int(stats.rounds)

    # the flagship wl engine (and its memory-proportional variant): the
    # bucketed all_to_all / drain rounds must also work across the real
    # process boundary, not just the in-process virtual mesh
    from pprx.dist.wl import ShardedWlEngine

    for prop in (False, True):
        # ccap >= n_local: no overflow deferral, so the result is exact
        # (deferred deliveries legitimately reshuffle sub-threshold
        # residuals — covered by the in-process overflow tests)
        wl = ShardedWlEngine(
            mesh, n, len(queries), ecap=m, bcap=8, cfg=cfg, mode=FORWARD,
            dtype=jnp.float64, ccap=64, proportional=prop,
        )
        pw, rw = wl.init_state(queries)
        degw, _, _, _, _, snap = wl.device_graph_wl(src, dst)
        pw, rw, rounds_w, *_ = wl.push_wl(pw, rw, degw, snap)
        assert int(rounds_w) < cfg.max_rounds
        check_local(pw, f"wl prop={prop}")

    print(f"mp-worker {pid}: ok rounds={int(rounds)}", flush=True)


if __name__ == "__main__":
    main()
