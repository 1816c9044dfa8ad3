from .mesh import GRAPH_AXIS, QUERY_AXIS, make_mesh
from .partition import PartitionedGraph, PartitionedIndex, partition_rows, partition_index
from .sharded import (EXCHANGE_MODES, ShardedForaEngine, ShardedTopkResult,
                      ShardedTopkRunner, exchange_bytes_model)

__all__ = ["GRAPH_AXIS", "QUERY_AXIS", "make_mesh", "PartitionedGraph",
           "PartitionedIndex", "partition_rows", "partition_index",
           "ShardedForaEngine", "ShardedTopkResult", "ShardedTopkRunner",
           "EXCHANGE_MODES", "exchange_bytes_model"]
