"""A/B microbench: Pallas segsum kernel vs XLA sorted scatter-add on TPU.

Shapes mirror the headline stream workload's dense scan round (W=2M window
edges delivery-sorted, S=128 sources, N=200k vertices). Interleaved same-
process timing with hard_sync (PERFORMANCE.md measurement traps).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/pprx-xla")
)

from pprx.engine.segsum import pad_len, segsum_add, tile_offsets
from pprx.eval.sync import hard_sync

N = int(os.environ.get("SEG_N", 200_000))
W = int(os.environ.get("SEG_W", 2_000_000))
S = int(os.environ.get("SEG_S", 128))
REPS = int(os.environ.get("SEG_REPS", 20))

rng = np.random.default_rng(0)
n_rows = N + 1
w_pad = pad_len(W)
seg = np.sort(rng.integers(0, N, size=W)).astype(np.int32)
seg_p = np.full(w_pad, N, np.int32)
seg_p[:W] = seg
contrib = rng.normal(size=(w_pad, S)).astype(np.float32)
rin = rng.normal(size=(n_rows, S)).astype(np.float32)
counts = np.bincount(seg_p, minlength=n_rows)
offsets = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))

rin_d = jnp.asarray(rin)
contrib_d = jnp.asarray(contrib)
seg_d = jnp.asarray(seg_p)
seg2d_d = jnp.asarray(seg_p.reshape(-1, 128))


@jax.jit
def xla_scatter(rin, contrib, seg):
    return rin.at[seg].add(contrib, indices_are_sorted=True)


def timeit(f, *args):
    out = f(*args)  # compile + warm
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / REPS * 1e3


ms_x = timeit(xla_scatter, rin_d, contrib_d, seg_d)
print(f"xla sorted scatter: {ms_x:.2f} ms  ({(w_pad*S*4*2)/ms_x/1e6:.0f} GB/s rd+wr-equiv)")

ref = np.asarray(xla_scatter(rin_d, contrib_d, seg_d))
for tr in (128, 256, 512):
    toff = tile_offsets(offsets, n_rows, tr)
    for ec in (1024, 2048):
        for prec in ("default", "split", "highest"):
            try:
                ms = timeit(
                    lambda r, c, s2, t: segsum_add(
                        r, c, s2, t, tr=tr, ec=ec, precision=prec
                    ),
                    rin_d, contrib_d, seg2d_d, toff,
                )
                out = np.asarray(segsum_add(
                    rin_d, contrib_d, seg2d_d, toff, tr=tr, ec=ec, precision=prec
                ))
                err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
                print(f"segsum tr={tr} ec={ec} {prec}: {ms:.2f} ms  ({ms_x/ms:.2f}x vs xla)  relerr={err:.1e}")
            except Exception as e:
                print(f"segsum tr={tr} ec={ec} {prec}: FAILED {type(e).__name__}: {str(e)[:300]}")
