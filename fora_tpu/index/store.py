"""Walk-index (de)serialization — the engine's persistent artifact.

Mirrors the reference's index files under ``<prefix>/index/<dataset>/``
[R: build.h serialization — reconstruction, SURVEY.md Sec. 5.4]: flat
memory-mappable arrays plus a JSON manifest recording the (alpha, eps,
delta, p_f, rmax, omega) the index was built for — a mismatched config must
refuse to serve, since index sizing is part of the accuracy contract.

Shard-aware: ``load(..., row_range=(lo, hi))`` memory-maps only the slice
of the endpoint pool covering rows [lo, hi), so each host touches only its
rows (SURVEY.md Sec. 5.4).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ResolvedConfig
from .build import WalkIndex

FORMAT_VERSION = 1


def save(index: WalkIndex, rcfg: ResolvedConfig, path: str) -> None:
    d = Path(path)
    d.mkdir(parents=True, exist_ok=True)
    np.save(d / "endpoints.npy", np.asarray(index.endpoints))
    np.save(d / "offsets.npy", np.asarray(index.offsets))
    np.save(d / "counts.npy", np.asarray(index.counts))
    meta = {
        "format_version": FORMAT_VERSION,
        "n": rcfg.n, "m": rcfg.m,
        "alpha": rcfg.alpha, "epsilon": rcfg.epsilon, "delta": rcfg.delta,
        "pfail": rcfg.pfail, "rmax": rcfg.rmax, "omega_unit": rcfg.omega_unit,
        "total_endpoints": int(np.asarray(index.counts).sum()),
    }
    (d / "meta.json").write_text(json.dumps(meta, indent=1))


def check_compatible(meta: dict, rcfg: ResolvedConfig) -> None:
    """An index serves a query config iff graph matches and the index was
    built at least as fine (rmax no larger, omega_unit no smaller)."""
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"index format {meta['format_version']} != "
                         f"{FORMAT_VERSION}")
    if (meta["n"], meta["m"]) != (rcfg.n, rcfg.m):
        raise ValueError("index built for a different graph "
                         f"(n,m)=({meta['n']},{meta['m']}) vs "
                         f"({rcfg.n},{rcfg.m})")
    if abs(meta["alpha"] - rcfg.alpha) > 1e-12:
        raise ValueError("index alpha mismatch")
    if meta["rmax"] > rcfg.rmax * (1 + 1e-9) or \
            meta["omega_unit"] < rcfg.omega_unit * (1 - 1e-9):
        raise ValueError(
            "index too coarse for this config: built at "
            f"rmax={meta['rmax']:.3g}, omega_unit={meta['omega_unit']:.3g}; "
            f"query needs rmax<={rcfg.rmax:.3g}, "
            f"omega_unit>={rcfg.omega_unit:.3g}")


def load(path: str, rcfg: Optional[ResolvedConfig] = None,
         row_range: Optional[Tuple[int, int]] = None) -> WalkIndex:
    d = Path(path)
    meta = json.loads((d / "meta.json").read_text())
    if rcfg is not None:
        check_compatible(meta, rcfg)
    offsets = np.load(d / "offsets.npy")
    counts = np.load(d / "counts.npy")
    endpoints = np.load(d / "endpoints.npy", mmap_mode="r")
    if row_range is not None:
        lo, hi = row_range
        e_lo = int(offsets[lo])
        e_hi = int(offsets[hi - 1] + counts[hi - 1]) if hi > lo else e_lo
        endpoints = np.asarray(endpoints[e_lo:e_hi])
        offsets = offsets[lo:hi] - e_lo
        counts = counts[lo:hi]
    else:
        endpoints = np.asarray(endpoints)
    return WalkIndex(endpoints=jnp.asarray(endpoints),
                     offsets=jnp.asarray(offsets),
                     counts=jnp.asarray(counts))


def load_meta(path: str) -> dict:
    return json.loads((Path(path) / "meta.json").read_text())
