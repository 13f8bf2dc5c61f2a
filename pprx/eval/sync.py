"""Reliable device-completion barrier for timing.

``jax.block_until_ready`` proved unreliable on this session's PJRT
transport (the axon TPU tunnel returns before execution finishes, which
silently inflated early throughput measurements by >100x). The only barrier
observed to actually wait is a scalar device-to-host read, so every pprx
timing path syncs through ``hard_sync``. On standard backends this costs
one extra scalar transfer — noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_sync(*arrays) -> None:
    """Block until every given array's producing computation has finished."""
    for a in jax.tree_util.tree_leaves(arrays):
        arr = jnp.asarray(a)
        float(arr.ravel()[0]) if arr.size else None
