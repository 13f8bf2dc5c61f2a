from pprx.dist.mesh import make_row_mesh
from pprx.dist.sharded import ShardedEngine, partition_edges

__all__ = ["make_row_mesh", "ShardedEngine", "partition_edges"]
