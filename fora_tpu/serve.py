"""Persistent serving loop — the M6 surface (SURVEY.md Sec. 7.2).

The reference has no server (its "serving" story is the CLI batch loop);
the north star's config 5 is sustained candidate-retrieval QPS at a fixed
precision SLO, so this module provides a line-oriented TCP JSON server with
micro-batching:

  request:  {"id": any, "source": int, "k": int (optional)}\n
  response: {"id": any, "nodes": [...], "scores": [...]}\n
  also:     {"cmd": "stats"} -> {"queries": N, "qps": ..., "batches": N}

Requests are queued and served in fixed-size batches (padding with repeats)
on the device; a batch is flushed when full or after ``max_wait_ms``.
Single-threaded asyncio + one device stream — the TPU is the throughput
unit, the host only marshals.
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Optional

import numpy as np


class ForaServer:
    def __init__(self, query_fn, batch: int, k: int, *,
                 max_wait_ms: float = 5.0, seed: int = 0):
        """query_fn(sources_i32[batch], seed_int) -> (ids [B,k], vals [B,k])
        — a blocking device call (e.g. wrapping TopkRunner.query)."""
        self.query_fn = query_fn
        self.batch = batch
        self.k = k
        self.max_wait_ms = max_wait_ms
        self.seed = seed
        self.queue: asyncio.Queue = asyncio.Queue()
        self.n_queries = 0
        self.n_batches = 0
        self.t_start = time.time()
        self._server: Optional[asyncio.AbstractServer] = None

    # --- protocol ---

    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter):
        while True:
            line = await reader.readline()
            if not line:
                break
            try:
                req = json.loads(line)
            except json.JSONDecodeError:
                writer.write(b'{"error": "bad json"}\n')
                await writer.drain()
                continue
            if req.get("cmd") == "stats":
                dt = time.time() - self.t_start
                writer.write((json.dumps({
                    "queries": self.n_queries, "batches": self.n_batches,
                    "qps": self.n_queries / max(dt, 1e-9)}) + "\n").encode())
                await writer.drain()
                continue
            if "source" not in req:
                writer.write(b'{"error": "missing source"}\n')
                await writer.drain()
                continue
            fut = asyncio.get_running_loop().create_future()
            await self.queue.put((int(req["source"]), fut))
            ids, vals = await fut
            k = min(int(req.get("k", self.k)), self.k)
            writer.write((json.dumps({
                "id": req.get("id"),
                "nodes": ids[:k].tolist(),
                "scores": [float(v) for v in vals[:k]]}) + "\n").encode())
            await writer.drain()
        writer.close()

    async def _batcher(self):
        while True:
            first = await self.queue.get()
            batch = [first]
            deadline = time.monotonic() + self.max_wait_ms / 1e3
            while len(batch) < self.batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    batch.append(await asyncio.wait_for(self.queue.get(),
                                                        timeout))
                except asyncio.TimeoutError:
                    break
            sources = np.array([s for s, _ in batch], dtype=np.int32)
            pad = self.batch - len(sources)
            padded = np.concatenate([sources, np.repeat(sources[-1:], pad)])
            self.seed += 1
            loop = asyncio.get_running_loop()
            ids, vals = await loop.run_in_executor(
                None, self.query_fn, padded, self.seed)
            ids, vals = np.asarray(ids), np.asarray(vals)
            self.n_queries += len(batch)
            self.n_batches += 1
            for i, (_, fut) in enumerate(batch):
                fut.set_result((ids[i], vals[i]))

    async def start(self, host: str = "127.0.0.1", port: int = 8471):
        self._task = asyncio.create_task(self._batcher())
        self._server = await asyncio.start_server(self._handle, host, port)
        return self._server.sockets[0].getsockname()[1]

    async def stop(self):
        self._task.cancel()
        if self._server:
            self._server.close()
            await self._server.wait_closed()


def serve_forever(query_fn, batch: int, k: int, host="127.0.0.1",
                  port: int = 8471, **kw):  # pragma: no cover - CLI wrapper
    async def main():
        s = ForaServer(query_fn, batch, k, **kw)
        p = await s.start(host, port)
        print(f"[fora-tpu] serving on {host}:{p}", flush=True)
        await asyncio.Event().wait()

    asyncio.run(main())
