from .build import WalkIndex, build_walk_index, index_counts, index_nbytes
from .store import save, load, load_meta, check_compatible

__all__ = ["WalkIndex", "build_walk_index", "index_counts", "index_nbytes",
           "save", "load", "load_meta", "check_compatible"]
