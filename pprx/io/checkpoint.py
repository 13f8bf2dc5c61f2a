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


def save_checkpoint(path: str, drv: StreamDriver) -> None:
    meta = {
        "n": drv.n,
        "head": drv.head,
        "step_idx": drv.step_idx,
        "mode": drv.mode,
        "cfg": dataclasses.asdict(drv.cfg),
        "scfg": dataclasses.asdict(drv.scfg),
    }
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        p=np.asarray(drv.state.p),
        r=np.asarray(drv.state.r),
        src=np.asarray(drv.graph.src),
        dst=np.asarray(drv.graph.dst),
        deg=np.asarray(drv.graph.deg),
    )


def load_checkpoint(path: str, stream_src: np.ndarray, stream_dst: np.ndarray) -> StreamDriver:
    """Rebuild a StreamDriver mid-stream. The caller re-supplies the stream
    (it is input data, not state); everything else comes from the file."""
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    cfg = PprConfig(**meta["cfg"])
    scfg = StreamConfig(**meta["scfg"])
    p = z["p"]
    drv = StreamDriver.__new__(StreamDriver)
    drv.stream_src = np.asarray(stream_src, dtype=np.int32)
    drv.stream_dst = np.asarray(stream_dst, dtype=np.int32)
    drv.n = meta["n"]
    drv.cfg = cfg
    drv.scfg = scfg
    drv.mode = meta["mode"]
    from pprx.engine.state import PprState
    from pprx.graph.dynamic import WindowGraph

    drv.state = PprState(p=jnp.asarray(p), r=jnp.asarray(z["r"]), mode=meta["mode"])
    drv.graph = WindowGraph(
        src=jnp.asarray(z["src"]), dst=jnp.asarray(z["dst"]), deg=jnp.asarray(z["deg"])
    )
    drv.head = meta["head"]
    drv.step_idx = meta["step_idx"]
    return drv
