"""Profiling + roofline accounting (SURVEY.md Sec. 5.1).

The reference self-reports phase timers only; here we add (a) Perfetto/XProf
trace capture via jax.profiler and (b) a bytes-moved roofline model for the
two hot SpMV phases, so a bench run can report achieved vs speed-of-light
HBM bandwidth — the north star's stated target for the push kernel.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

import jax
import numpy as np

# HBM bandwidth by device kind (bytes/s); conservative datasheet numbers.
HBM_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.1e11,
    "TPU v5e": 8.1e11,
    "TPU v5p": 2.765e12,
    "TPU v6 lite": 1.64e12,
    "TPU v6e": 1.64e12,
    "cpu": 5.0e10,
}


def device_hbm_bw(device=None) -> float:
    kind = (device or jax.devices()[0]).device_kind
    for k, v in HBM_BW.items():
        if kind.lower().startswith(k.lower()):
            return v
    return 8.1e11


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XProf/Perfetto trace around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class SpmvRoofline:
    """Bytes accounting for one gather+segment_sum superstep over E edges
    with batch width B (f32 values, i32 indices)."""

    edges: int
    batch: int
    nodes: int

    @property
    def bytes_moved(self) -> int:
        # read: edge src+dst indices, gathered rows; write+read: accumulator
        return (self.edges * 8                      # indices
                + self.edges * self.batch * 4       # gathered contrib rows
                + 2 * self.nodes * self.batch * 4)  # accumulator update

    def light_speed_secs(self, bw: Optional[float] = None) -> float:
        return self.bytes_moved / (bw or device_hbm_bw())

    def efficiency(self, measured_secs: float,
                   bw: Optional[float] = None) -> float:
        return self.light_speed_secs(bw) / max(measured_secs, 1e-12)


def fence(out):
    """TRUE completion fence: device->host read of one element of ``out``.

    ``jax.block_until_ready`` is NOT a completion fence on relayed/tunneled
    TPU runtimes: the relay ACKs the ready-event while the program is still
    executing remotely (measured on the v5e loopback relay: a ~160 ms
    superstep "blocked" in 70 us, reporting 84x speed-of-light).  A host
    transfer of any element cannot be ACKed early — the value must exist —
    so timing loops fence through this instead.  The one-element slice
    compiles one tiny program per leaf shape (persistently cached).

    Any output of the fenced program works as the read target: a single
    executable's outputs complete together, so one element of one array
    fences the whole call."""
    for leaf in jax.tree_util.tree_leaves(out):
        if getattr(leaf, "size", 0):
            np.asarray(leaf[(0,) * leaf.ndim])
            return out
    jax.block_until_ready(out)   # no device payload to read through
    return out


def measure(fn, *args, reps: int = 3, warmup: int = 1) -> float:
    """Median wall time of a completed call (host-read fenced — see
    ``fence`` for why block_until_ready alone is insufficient here)."""
    for _ in range(warmup):
        fence(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
