from .build import (WalkIndex, build_walk_index, dedup_index, index_counts,
                    index_nbytes, indexed_walk_contrib, pack_index,
                    NUM_BUCKETS)
from .store import save, load, load_meta, check_compatible

__all__ = ["WalkIndex", "build_walk_index", "dedup_index", "index_counts",
           "index_nbytes", "indexed_walk_contrib", "pack_index",
           "NUM_BUCKETS", "save", "load", "load_meta", "check_compatible"]
