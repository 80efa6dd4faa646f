"""Multi-host scaffolding (SURVEY §2.3 last row, §5 distributed
backend; the structure that replaces the reference's single-host
pthreads pipeline, threads.c:726-1014, when one host is not enough).

Design: hosts are independent SPMD processes over one global runtime
(`jax.distributed`).  The INPUT is striped at batch granularity —
host h maps batches b with b % n_hosts == h — so no host ever needs
another host's reads; each host writes its own SAM shard plus a tiny
sidecar recording per-batch byte extents, and `merge_shards` restores
the exact single-host output order by round-robining batches.  The
merge is deterministic and byte-identical to a single-host run of the
same pipeline (same batches, same per-batch RNG reseed).

Activation is env-gated so single-host behaviour never changes:
  SMALT_TPU_COORD=host:port    coordinator address
  SMALT_TPU_NPROCS=N           number of processes
  SMALT_TPU_PROCID=i           this process id
(or pre-set JAX service env); `maybe_init_distributed()` is a no-op
without them.
"""
from __future__ import annotations

import json
import os
from typing import Optional, TextIO, Tuple


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize jax.distributed from the environment when configured.
    Returns (process_index, process_count) — (0, 1) standalone."""
    coord = os.environ.get("SMALT_TPU_COORD")
    if not coord:
        return 0, 1
    import jax
    nprocs = int(os.environ.get("SMALT_TPU_NPROCS", "1"))
    procid = int(os.environ.get("SMALT_TPU_PROCID", "0"))
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs,
                               process_id=procid)
    return jax.process_index(), jax.process_count()


class ShardWriter:
    """SAM shard + batch-extent sidecar for one host.

    write_batch(text) appends one batch's records and logs its byte
    extent; close() writes `<path>.batches.json` with the global batch
    numbers this shard holds."""

    def __init__(self, path: str, host_id: int, n_hosts: int):
        self.path = path
        self.host_id = host_id
        self.n_hosts = n_hosts
        self._fp: TextIO = open(path, "w")
        self._extents = []          # (global_batch_no, start, end)
        self._pos = 0

    def write_batch(self, global_batch_no: int, text: str) -> None:
        self._fp.write(text)
        end = self._pos + len(text)
        self._extents.append((global_batch_no, self._pos, end))
        self._pos = end

    def close(self) -> None:
        self._fp.close()
        with open(self.path + ".batches.json", "w") as f:
            json.dump({"host": self.host_id, "n_hosts": self.n_hosts,
                       "extents": self._extents}, f)


def merge_shards(shard_paths, out, header: Optional[str] = None) -> int:
    """Round-robin the per-batch extents of all shards back into global
    batch order; byte-identical to the single-host output.  Returns the
    number of batches merged."""
    shards = []
    for p in shard_paths:
        with open(p + ".batches.json") as f:
            meta = json.load(f)
        shards.append((p, meta["extents"]))
    if header:
        out.write(header)
    merged = {}
    for p, extents in shards:
        with open(p) as f:
            data = f.read()
        for bno, s, e in extents:
            if bno in merged:
                raise ValueError(f"batch {bno} present in two shards")
            merged[bno] = data[s:e]
    for bno in sorted(merged):
        out.write(merged[bno])
    return len(merged)
