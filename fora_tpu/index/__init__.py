from .build import (WalkIndex, build_walk_index, dedup_index, index_counts,
                    index_nbytes, indexed_walk_contrib, pack_index,
                    NUM_BUCKETS)
from .build_sharded import build_walk_index_sharded, sharded_build_bytes
from .store import (save, load, load_meta, check_compatible,
                    graph_fingerprint)

__all__ = ["WalkIndex", "build_walk_index", "build_walk_index_sharded",
           "sharded_build_bytes", "dedup_index", "index_counts",
           "index_nbytes", "indexed_walk_contrib", "pack_index",
           "NUM_BUCKETS", "save", "load", "load_meta", "check_compatible",
           "graph_fingerprint"]
