"""Host driver for the sharded sliding-window stream (SURVEY.md §3.5, L4+L5).

Per-shard slot management lives on the host (it is pure bookkeeping over the
stream the host already owns): each shard has ``ecap`` buffer slots and a
free-slot stack; expiring edges free their slot, new edges claim one. The
device only ever sees fixed-shape, trash-slot-padded batches — every slide
step is one jitted sharded call (ShardedEngine.slide).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from pprx.config import PprConfig, StreamConfig
from pprx.dist.sharded import ShardedEngine
from pprx.engine.state import FORWARD


class ShardedStreamDriver:
    def __init__(
        self,
        stream_src: np.ndarray,
        stream_dst: np.ndarray,
        n: int,
        queries,
        cfg: PprConfig,
        scfg: StreamConfig,
        mesh: jax.sharding.Mesh,
        mode: int = FORWARD,
        ecap: int | None = None,
        dtype=jnp.float32,
    ):
        if stream_src.shape[0] < scfg.window:
            raise ValueError("stream shorter than one window")
        self.stream_src = np.asarray(stream_src, dtype=np.int64)
        self.stream_dst = np.asarray(stream_dst, dtype=np.int64)
        self.n = n
        self.cfg = cfg
        self.scfg = scfg
        self.mode = mode
        w = scfg.window
        queries = list(queries)
        self.eng = ShardedEngine(
            mesh,
            n,
            len(queries),
            ecap=w if ecap is None else ecap,
            bcap=scfg.slide,
            cfg=cfg,
            mode=mode,
            dtype=dtype,
        )
        eng = self.eng
        self.p, self.r = eng.init_state(queries)
        self.deg, self.egl, self.eog, self.eva, counts = eng.device_graph(
            self.stream_src[:w], self.stream_dst[:w]
        )
        # host slot bookkeeping: stream position -> (owner shard, local slot)
        self._gather_key = (
            self.stream_src if mode == FORWARD else self.stream_dst
        ) // eng.n_local
        self.pos_owner = np.full(self.stream_src.shape[0], -1, np.int32)
        self.pos_slot = np.full(self.stream_src.shape[0], -1, np.int32)
        fill = np.zeros(eng.n_rows, np.int64)
        for pos in range(w):
            k = int(self._gather_key[pos])
            self.pos_owner[pos] = k
            self.pos_slot[pos] = fill[k]
            fill[k] += 1
        assert (fill == counts).all()
        self.free_slots: list[list[int]] = [
            list(range(int(fill[k]), eng.ecap)) for k in range(eng.n_rows)
        ]
        self.head = w
        self.step_idx = 0
        self._row_sh = NamedSharding(mesh, eng.row_spec)

    # -- helpers -------------------------------------------------------
    def _rows_array(self, per_shard: list[np.ndarray]) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(np.concatenate(per_shard)), self._row_sh)

    def seed(self):
        self.p, self.r, rounds, pushes, epushes = self.eng.push(
            self.p, self.r, self.deg, self.egl, self.eog, self.eva
        )
        return {"rounds": int(rounds), "pushes": float(pushes), "edge_pushes": float(epushes)}

    @property
    def steps_available(self) -> int:
        return (self.stream_src.shape[0] - self.head) // self.scfg.slide

    # -- the slide loop ------------------------------------------------
    def run(self, n_steps: int | None = None) -> Iterator[dict]:
        eng = self.eng
        b = self.scfg.slide
        n_local = eng.n_local
        total = self.steps_available if n_steps is None else n_steps
        for _ in range(total):
            if self.head + b > self.stream_src.shape[0]:
                return
            expire = np.arange(self.head - self.scfg.window, self.head - self.scfg.window + b)
            fresh = np.arange(self.head, self.head + b)

            # per-shard batch builders, padded to bcap with trash-slot targets
            K = eng.n_rows
            trash = eng.trash_slot

            def empty(fillval=0):
                return [np.full(b, fillval, np.int32) for _ in range(K)]

            # by-src-owner correction batches (both modes need these)
            src_owner_new = (self.stream_src[fresh] // n_local).astype(np.int32)
            src_owner_old = (self.stream_src[expire] // n_local).astype(np.int32)
            del_u, del_w, del_v = empty(), empty(), empty()
            ins_u, ins_w, ins_v = empty(), empty(), empty()
            cnt_d = np.zeros(K, np.int64)
            cnt_i = np.zeros(K, np.int64)
            for pos, k in zip(expire, src_owner_old):
                j = cnt_d[k]
                del_u[k][j] = self.stream_src[pos] - k * n_local
                del_w[k][j] = self.stream_dst[pos]
                del_v[k][j] = 1
                cnt_d[k] += 1
            for pos, k in zip(fresh, src_owner_new):
                j = cnt_i[k]
                ins_u[k][j] = self.stream_src[pos] - k * n_local
                ins_w[k][j] = self.stream_dst[pos]
                ins_v[k][j] = 1
                cnt_i[k] += 1

            # slot management (partitioned by GATHER-endpoint owner)
            clear_slots = empty(trash)
            write_slots = empty(trash)
            cnt_c = np.zeros(K, np.int64)
            cnt_w = np.zeros(K, np.int64)
            for pos in expire:
                k = int(self.pos_owner[pos])
                clear_slots[k][cnt_c[k]] = self.pos_slot[pos]
                self.free_slots[k].append(int(self.pos_slot[pos]))
                cnt_c[k] += 1
            write_dl, write_sg, write_v = empty(), empty(), empty()
            for pos in fresh:
                k = int(self._gather_key[pos])
                if not self.free_slots[k]:
                    raise RuntimeError(
                        f"shard {k} edge buffer full (ecap={eng.ecap}); "
                        "raise ecap to absorb this degree skew"
                    )
                slot = self.free_slots[k].pop()
                self.pos_owner[pos] = k
                self.pos_slot[pos] = slot
                j = cnt_w[k]
                write_slots[k][j] = slot
                if self.mode == FORWARD:
                    # forward: gather endpoint = src; batch entry i of ins_*
                    # must align with write_slots entry i — same owner & order
                    pass
                else:
                    write_dl[k][j] = self.stream_dst[pos] - k * n_local
                    write_sg[k][j] = self.stream_src[pos]
                    write_v[k][j] = 1
                cnt_w[k] += 1

            A = self._rows_array
            if self.mode == FORWARD:
                # forward: write batches are the by-src-owner insert batches,
                # which were filled in the same stream order per shard
                out = eng.slide(
                    self.p, self.r, self.deg, self.egl, self.eog, self.eva,
                    A(del_u), A(del_w), A(del_v),
                    A(ins_u), A(ins_w), A(ins_v),
                    A(clear_slots), A(write_slots),
                )
            else:
                out = eng.slide(
                    self.p, self.r, self.deg, self.egl, self.eog, self.eva,
                    A(del_u), A(del_v), A(ins_u), A(ins_v),
                    A(clear_slots), A(write_slots),
                    A(write_dl), A(write_sg), A(write_v),
                )
            (self.p, self.r, rounds, pushes, epushes,
             self.deg, self.egl, self.eog, self.eva) = out
            self.head += b
            self.step_idx += 1
            yield {
                "rounds": int(rounds),
                "pushes": float(pushes),
                "edge_pushes": float(epushes),
            }

    # -- host views ----------------------------------------------------
    def host_p(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.p))

    def host_r(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.r))

    def host_deg(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.deg))
