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

from typing import Callable, List, Optional, Sequence, Tuple

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


def gather_blobs_to_root(blob: bytes) -> Optional[List[bytes]]:
    """All-gather variable-length byte blobs; returns the ordered list on
    process 0, None elsewhere.  (MPI_Gather lengths + MPI_Gatherv payload,
    gt_mpi_gather.cc:167-263, on fixed-width padded device arrays.)"""
    import jax
    if jax.process_count() == 1:
        return [blob]
    from jax.experimental import multihost_utils
    n = jax.process_count()
    length = np.asarray([len(blob)], dtype=np.int64)
    all_lengths = multihost_utils.process_allgather(length).reshape(n)
    max_len = int(all_lengths.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[:len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(padded)
    if jax.process_index() != 0:
        return None
    return [bytes(gathered[i][:int(all_lengths[i])].tobytes())
            for i in range(n)]


def run_partitioned_query(run_rank: Callable[[int], bytes],
                          partitions: Sequence[int]) -> Optional[bytes]:
    """Run this host's partitions, gather all hosts' outputs in partition
    order on process 0."""
    local = b"".join(run_rank(p) for p in partitions)
    pieces = gather_blobs_to_root(local)
    if pieces is None:
        return None
    return b"".join(pieces)
