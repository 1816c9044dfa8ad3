from .mesh import GRAPH_AXIS, QUERY_AXIS, make_mesh
from .partition import PartitionedGraph, PartitionedIndex, partition_rows, partition_index
from .sharded import ShardedForaEngine, ShardedTopkResult

__all__ = ["GRAPH_AXIS", "QUERY_AXIS", "make_mesh", "PartitionedGraph",
           "PartitionedIndex", "partition_rows", "partition_index",
           "ShardedForaEngine", "ShardedTopkResult"]
