"""Top-k-by-PPR-score retrieval head.

Build-only component (SURVEY.md L6 / [BASELINE] config 4): the reference
reports error/throughput, not top-k serving; the TPU build adds a batched
candidate-generation head over the multi-source reserve matrix.

``p`` is vertex-major [N+1, S]; top-k runs per query over the vertex axis.
``exact=False`` uses ``lax.approx_max_k`` — TPU-native binned top-k with
~10x throughput at recall ~0.95+ for k=100, N large (the right default for
candidate generation, where downstream ranking absorbs tiny recall loss).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pprx.engine.state import PprState


@functools.partial(jax.jit, static_argnames=("k", "exact"))
def topk_candidates(
    p: jnp.ndarray, k: int, exact: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query top-k vertices by reserve score.

    p: [N+1, S] reserve matrix (phantom row excluded from candidates).
    Returns (scores [S, k], ids [S, k]), scores descending per query.
    """
    scores_t = p[:-1].T  # [S, N]
    if exact:
        return jax.lax.top_k(scores_t, k)
    return jax.lax.approx_max_k(scores_t, k)


def retrieve(state: PprState, k: int = 100, exact: bool = True):
    """Candidate generation from a converged push state ([BASELINE] config 4:
    512 sources/launch, k=100)."""
    return topk_candidates(state.p, k, exact)
