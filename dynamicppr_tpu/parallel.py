"""Parallel layer: mesh + sharded execution (alias of pprx.dist)."""

from pprx.dist.mesh import make_row_mesh
from pprx.dist.sharded import EdgePartition, ShardedEngine, partition_edges
from pprx.dist.stream import ShardedStreamDriver

__all__ = [
    "make_row_mesh",
    "EdgePartition",
    "ShardedEngine",
    "partition_edges",
    "ShardedStreamDriver",
]
