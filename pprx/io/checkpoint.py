"""Stream checkpoint/resume (SURVEY.md §5 "Checkpoint/resume").

The reference has none; for streams it is trivially valuable because the
full engine state is tiny and explicit: (window buffers, degrees, p, r,
stream head, config). One ``.npz`` per host; resuming mid-stream is exact —
the resumed driver produces bit-identical states to an uninterrupted run
(tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig, StreamConfig
from pprx.graph.stream import StreamDriver


def save_checkpoint(path: str, drv) -> None:
    """Works for both StreamDriver and HybridStreamDriver: the persisted
    state is the COO window + degrees + p/r (the snapshot/overlay are
    derived data, rebuilt on resume)."""
    from pprx.engine.sparse import HybridGraph

    graph = drv.graph.window if isinstance(drv.graph, HybridGraph) else drv.graph
    meta = {
        "n": drv.n,
        "head": drv.head,
        "step_idx": drv.step_idx,
        "mode": drv.mode,
        "engine": "hybrid" if isinstance(drv.graph, HybridGraph) else "dense",
        "cfg": dataclasses.asdict(drv.cfg),
        "scfg": dataclasses.asdict(drv.scfg),
    }
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        p=np.asarray(drv.state.p),
        r=np.asarray(drv.state.r),
        src=np.asarray(graph.src),
        dst=np.asarray(graph.dst),
        deg=np.asarray(graph.deg),
    )


def load_checkpoint(path: str, stream_src: np.ndarray, stream_dst: np.ndarray) -> StreamDriver:
    """Rebuild a StreamDriver mid-stream. The caller re-supplies the stream
    (it is input data, not state); everything else comes from the file."""
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    cfg = PprConfig(**meta["cfg"])
    scfg = StreamConfig(**meta["scfg"])
    from pprx.engine.state import PprState
    from pprx.graph.dynamic import WindowGraph

    state = PprState(p=jnp.asarray(z["p"]), r=jnp.asarray(z["r"]), mode=meta["mode"])
    window = WindowGraph(
        src=jnp.asarray(z["src"]), dst=jnp.asarray(z["dst"]), deg=jnp.asarray(z["deg"])
    )
    if meta.get("engine") == "hybrid":
        from pprx.engine.sparse import HybridGraph
        from pprx.graph.hybrid_stream import HybridStreamDriver

        drv = HybridStreamDriver.__new__(HybridStreamDriver)
        rebuild_every = 16
        drv.graph = HybridGraph.build(
            window, meta["mode"], overlay_cap=2 * scfg.slide * rebuild_every
        )
        drv.rebuild_every = rebuild_every
        drv.ov_count = 0
        drv.fcap = meta["n"] + 1
        drv.ecap = min(max(4 * scfg.slide, 16_384), scfg.window)
        drv.scan_ecap = min(4 * drv.ecap, max(scfg.window // 2, drv.ecap))
        drv.wcap = max(drv.ecap, 4 * scfg.slide)
        drv.ovacap = max(4 * scfg.slide, 8192)
        from pprx.engine.sparse import make_tiers

        drv.tiers = make_tiers(drv.wcap, drv.ecap, drv.ovacap)
        drv.worklist = True
    else:
        drv = StreamDriver.__new__(StreamDriver)
        drv.graph = window
    drv.stream_src = np.asarray(stream_src, dtype=np.int32)
    drv.stream_dst = np.asarray(stream_dst, dtype=np.int32)
    drv.n = meta["n"]
    drv.cfg = cfg
    drv.scfg = scfg
    drv.mode = meta["mode"]
    drv.state = state
    drv.head = meta["head"]
    drv.step_idx = meta["step_idx"]
    return drv
