"""Record the scaling-evidence artifact (SCALING_r{N}.json).

Produces the functional strong-scaling + wire-model numbers the north star's
">= 0.7 efficiency at 4 hosts" axis needs evidence for (BASELINE.md):

  1. in-process: scripts/scaling_test.py over graph shards 1..8 on the
     virtual CPU mesh, indexed, for exchange modes routed and hier;
  2. multi-process: tests/multihost_driver.py bench mode — the SAME
     8-shard indexed hier pipeline split across 1, 2, and 4 localhost
     processes (each process = one "host"; the hier exchange's DCN stage
     crosses the process boundary exactly as it would cross real DCN).

CPU-mesh numbers validate the code path and collective volumes, not real
ICI/DCN bandwidth — the artifact records them as `functional: true`.

Usage: python scripts/record_scaling.py [--out SCALING_r03.json]
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_scaling(exchange: str, nlog2=14, edgef=8, batch=32):
    cmd = [sys.executable, str(ROOT / "scripts" / "scaling_test.py"),
           "--nlog2", str(nlog2), "--edgef", str(edgef),
           "--batch", str(batch), "--meshes", "1,2,4,8", "--indexed",
           "--exchange", exchange, "--chips-per-host", "2"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                         cwd=ROOT)
    if out.returncode != 0:
        raise RuntimeError(f"{exchange}: {out.stderr[-2000:]}")
    return [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]


def run_multihost(nproc: int, local: int, port: int):
    procs = [subprocess.Popen(
        [sys.executable, str(ROOT / "tests" / "multihost_driver.py"),
         str(p), str(nproc), str(port), "bench", str(local)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=ROOT)
        for p in range(nproc)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"proc failed: {se[-2000:]}")
    line = [l for l in outs[0][0].splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r03.json")
    args = ap.parse_args()

    rec = {"functional": True,
           "note": "virtual CPU mesh / localhost processes: validates "
                   "code paths + collective volumes, not ICI/DCN bandwidth",
           "strong_scaling": {}, "multihost": []}
    for exchange in ("routed", "hier"):
        t0 = time.time()
        rows = run_scaling(exchange)
        rec["strong_scaling"][exchange] = rows
        print(f"[scaling] {exchange}: {len(rows)} mesh sizes in "
              f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    for nproc, local, port in ((1, 8, 18731), (2, 4, 18732), (4, 2, 18733)):
        t0 = time.time()
        row = run_multihost(nproc, local, port)
        rec["multihost"].append(row)
        print(f"[scaling] multihost x{nproc}: {row['qps']} q/s in "
              f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    base = rec["multihost"][0]["qps"]
    for row in rec["multihost"]:
        row["efficiency_vs_1proc"] = round(row["qps"] / base, 3)
    Path(args.out).write_text(json.dumps(rec, indent=1))
    print(json.dumps({"wrote": args.out,
                      "hier_eff_4proc":
                          rec["multihost"][-1]["efficiency_vs_1proc"]}))


if __name__ == "__main__":
    main()
