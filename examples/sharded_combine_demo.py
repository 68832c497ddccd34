"""Multi-chip sharded combine demo on a virtual 8-device CPU mesh.

The production layout: a 2-D (position, sample-row) jax.sharding.Mesh;
genome positions shard like the reference's MPI column partitions
(SURVEY.md 2.7) over one mesh axis, samples over the other, with
cross-sample reductions as psum/all_gather over ICI.  On real hardware
the same code runs over TPU chips — here XLA simulates 8 devices.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from genomicsdb_tpu.ops.combine_step import synthesize_cohort  # noqa: E402
from genomicsdb_tpu.parallel.sharded import (  # noqa: E402
    make_mesh, pad_block_for_mesh, shard_block, sharded_combine_step)


def main():
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")
    n_pos, n_row = 4, 2
    mesh = make_mesh(n_pos, n_row)
    blk = synthesize_cohort(num_samples=8, cells_per_sample=64,
                            region_len=4096, seed=7)
    blk = pad_block_for_mesh(blk, n_pos, n_row)
    args = shard_block(mesh, blk)
    step = sharded_combine_step(mesh, max_merged=4, ploidy=2)
    out = step(*args)
    jax.block_until_ready(out)
    pl = np.asarray(out["pl"])
    dp = np.asarray(out["dp_info_sum"])
    print(f"mesh=({n_pos} pos x {n_row} row), "
          f"combined block: pl{list(pl.shape)}, "
          f"{int((dp > 0).sum())} records with INFO DP")


if __name__ == "__main__":
    main()
