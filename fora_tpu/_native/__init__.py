"""ctypes bindings for the native (C++) components.

Builds lazily on first use if the shared library is missing (g++ is in the
image); falls back to pure-numpy paths when compilation is impossible.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libfora_native.so"

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.fora_count_edges.restype = ctypes.c_int64
    lib.fora_count_edges.argtypes = [ctypes.c_char_p]
    lib.fora_parse_edges.restype = ctypes.c_int64
    lib.fora_parse_edges.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    _lib = lib
    return lib


def _native_parse_edges(path: str) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    count = lib.fora_count_edges(path.encode())
    if count < 0:
        raise IOError(f"cannot read {path}")
    src = np.empty(count, dtype=np.int64)
    dst = np.empty(count, dtype=np.int64)
    got = lib.fora_parse_edges(
        path.encode(),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        count,
    )
    if got < 0:
        raise IOError(f"parse failed for {path} (rc={got})")
    return src[:got], dst[:got]


# Public symbol: None when the native path cannot be used at all.
native_parse_edges = _native_parse_edges if _load() is not None else None
