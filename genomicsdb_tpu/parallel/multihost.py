"""Multi-host execution driver.

The reference distributes with one MPI rank per column partition
(tools/src/vcf2tiledb.cc:44-52, gt_mpi_gather.cc:166-263).  Here each JAX
process (host) owns one or more column partitions; inside a host, chips
shard the (pos, row) mesh (parallel/sharded.py).  Host-level results are
either partition-local text (combined VCF — stitched by rank order, no
communication, mirroring gt_mpi_gather.cc:322-366) or serialized variant
blobs gathered to process 0 (query/serialize.py — the MPI_Gatherv
equivalent, over DCN via jax.experimental.multihost_utils).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def my_partitions(num_partitions: int) -> List[int]:
    """Column partitions owned by this process (block distribution)."""
    import jax
    pid = jax.process_index()
    n = jax.process_count()
    per = (num_partitions + n - 1) // n
    return [p for p in range(pid * per, min((pid + 1) * per,
                                            num_partitions))]


# per-transfer ceiling: keeps any single collective payload far below
# the 2 GB int32 offsets limit (the reference needs BigMPI for this,
# gt_mpi_gather.cc:172-217; here large blobs just take more rounds)
GATHER_CHUNK = 1 << 30


def gather_blobs_to_root(blob: bytes) -> Optional[List[bytes]]:
    """Gather variable-length byte blobs to process 0 with gatherv
    semantics (MPI_Gather lengths + MPI_Gatherv payload,
    gt_mpi_gather.cc:167-263): each process's payload moves at its OWN
    size — no max-size padding, so root memory is O(sum(len)) rather
    than O(n_hosts * max_len) — and blobs above GATHER_CHUNK move in
    bounded slices (>2 GB safe, the reference's BigMPI case)."""
    import jax
    if jax.process_count() == 1:
        return [blob]
    from jax.experimental import multihost_utils
    n = jax.process_count()
    pid = jax.process_index()
    length = np.asarray([len(blob)], dtype=np.int64)
    all_lengths = multihost_utils.process_allgather(length).reshape(n)
    src = np.frombuffer(blob, dtype=np.uint8)
    pieces: List[bytes] = []
    for i in range(n):
        li = int(all_lengths[i])
        parts = []
        for off in range(0, max(li, 1), GATHER_CHUNK):
            m = min(GATHER_CHUNK, li - off) if li else 0
            chunk = src[off:off + m] if pid == i                 else np.zeros(m, dtype=np.uint8)
            got = multihost_utils.broadcast_one_to_all(
                chunk, is_source=(pid == i))
            if pid == 0:
                parts.append(np.asarray(got).tobytes())
        if pid == 0:
            pieces.append(b"".join(parts))
    if pid != 0:
        return None
    return pieces


def run_partitioned_query(run_rank: Callable[[int], bytes],
                          partitions: Sequence[int]) -> Optional[bytes]:
    """Run this host's partitions, gather all hosts' outputs in partition
    order on process 0."""
    local = b"".join(run_rank(p) for p in partitions)
    pieces = gather_blobs_to_root(local)
    if pieces is None:
        return None
    return b"".join(pieces)
