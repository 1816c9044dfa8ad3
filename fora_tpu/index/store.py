"""Walk-index (de)serialization — the engine's persistent artifact.

Mirrors the reference's index files under ``<prefix>/index/<dataset>/``
[R: build.h serialization — reconstruction, SURVEY.md Sec. 5.4]: flat
memory-mappable arrays plus a JSON manifest recording the (alpha, eps,
delta, p_f, rmax, omega) the index was built for — a mismatched config must
refuse to serve, since index sizing is part of the accuracy contract.

Format v2 stores the multi-resolution SpMV layout (see build.py):
  edge_src.npy / edge_dst.npy   endpoint-sorted index edges, bucketed
  counts_cum.npy                per-node visible-pool sizes per depth
  meta.json                     config + bucket offsets
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import ResolvedConfig
from .build import WalkIndex

FORMAT_VERSION = 2


def graph_fingerprint(g) -> str:
    """Content hash of the walk-relevant graph structure (adjacency +
    weights).  (n, m) alone can't tell two graphs apart — an edge rewire
    or a weight change with the same shape would silently serve a stale
    index; walks are distribution-bound to the exact adjacency."""
    import hashlib
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(g.out_indptr).tobytes())
    h.update(np.ascontiguousarray(g.out_indices).tobytes())
    if getattr(g, "out_w", None) is not None:
        h.update(np.ascontiguousarray(g.out_w).tobytes())
    return h.hexdigest()


def save(index: WalkIndex, rcfg: ResolvedConfig, path: str,
         graph=None) -> None:
    """``graph`` (CSRGraph or DeviceGraph, optional): records a content
    fingerprint so load() can refuse a same-shape different graph."""
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    np.save(d / "edge_src.npy", np.asarray(index.edge_src))
    np.save(d / "edge_dst.npy", np.asarray(index.edge_dst))
    np.save(d / "counts_cum.npy", np.asarray(index.counts_cum))
    if index.edge_mult is not None:
        np.save(d / "edge_mult.npy", np.asarray(index.edge_mult))
    meta = {
        "format_version": FORMAT_VERSION,
        "n": rcfg.n, "m": rcfg.m,
        "alpha": rcfg.alpha, "epsilon": rcfg.epsilon, "delta": rcfg.delta,
        "pfail": rcfg.pfail, "rmax": index.rmax_built,
        "omega_unit": index.omega_unit_built,
        "bucket_offsets": [int(x) for x in index.bucket_offsets],
        "total_edges": int(index.total_edges),
    }
    if graph is not None:
        meta["graph_sha"] = graph_fingerprint(graph)
    (d / "meta.json").write_text(json.dumps(meta, indent=1))


def check_compatible(meta: dict, rcfg: ResolvedConfig,
                     graph=None) -> None:
    """An index serves a query config iff graph matches and the index was
    built at least as fine (omega_unit no smaller)."""
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"index format {meta['format_version']} != "
                         f"{FORMAT_VERSION}; rebuild the index")
    if (meta["n"], meta["m"]) != (rcfg.n, rcfg.m):
        raise ValueError("index built for a different graph "
                         f"(n,m)=({meta['n']},{meta['m']}) vs "
                         f"({rcfg.n},{rcfg.m})")
    if graph is not None and meta.get("graph_sha") is not None \
            and graph_fingerprint(graph) != meta["graph_sha"]:
        raise ValueError(
            "index built for a different graph (content fingerprint "
            "mismatch at equal (n, m) — edges or weights changed)")
    if abs(meta["alpha"] - rcfg.alpha) > 1e-12:
        raise ValueError("index alpha mismatch")
    if meta["omega_unit"] < rcfg.omega_unit * (1 - 1e-9):
        raise ValueError(
            "index too coarse for this config: built at "
            f"omega_unit={meta['omega_unit']:.3g}; query needs "
            f">= {rcfg.omega_unit:.3g}")


def load(path: str, rcfg: Optional[ResolvedConfig] = None,
         dedup: bool = True, graph=None) -> WalkIndex:
    """``dedup``: indexes saved before the duplicate-merge layout (no
    edge_mult.npy) are upgraded in memory on load — lossless, and strictly
    cheaper to query (see build.py module docstring)."""
    from .build import dedup_index
    d = Path(path)
    meta = json.loads((d / "meta.json").read_text())
    if rcfg is not None:
        check_compatible(meta, rcfg, graph=graph)
    mult_f = d / "edge_mult.npy"
    idx = WalkIndex(
        edge_src=jnp.asarray(np.load(d / "edge_src.npy")),
        edge_dst=jnp.asarray(np.load(d / "edge_dst.npy")),
        bucket_offsets=np.asarray(meta["bucket_offsets"], dtype=np.int64),
        counts_cum=jnp.asarray(np.load(d / "counts_cum.npy")),
        omega_unit_built=meta["omega_unit"],
        rmax_built=meta["rmax"],
        edge_mult=jnp.asarray(np.load(mult_f)) if mult_f.exists() else None,
    )
    if dedup and idx.edge_mult is None:
        idx = dedup_index(idx)
    return idx


def load_meta(path: str) -> dict:
    return json.loads((Path(path) / "meta.json").read_text())
