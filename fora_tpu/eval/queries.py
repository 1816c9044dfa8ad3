"""Query-set tooling: generate / save / load source-node sets.

Mirrors the reference's ``generate-ss-query`` action and ``<dataset>.query``
files (one source id per line) [R: query.h — reconstruction, SURVEY.md
Sec. 2.1].  Sources are sampled degree-uniform over nodes with out-degree
> 0 (a query from an isolated node is trivially its own answer).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..graph.csr import CSRGraph


def generate_sources(g: CSRGraph, count: int, seed: int = 0,
                     require_outdeg: bool = True) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if require_outdeg:
        pool = np.nonzero(np.asarray(g.out_deg) > 0)[0]
    else:
        pool = np.arange(g.n)
    return rng.choice(pool, size=count, replace=count > len(pool)).astype(np.int64)


def save_queries(sources: np.ndarray, path: str) -> None:
    Path(path).write_text("".join(f"{int(s)}\n" for s in sources))


def load_queries(path: str) -> np.ndarray:
    return np.array([int(x) for x in Path(path).read_text().split()],
                    dtype=np.int64)
