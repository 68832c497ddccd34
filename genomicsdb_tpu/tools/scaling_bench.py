"""Scaling-efficiency harness for the sharded combine.

Measures combine throughput on 1..N devices of a (pos, row) mesh and
reports parallel efficiency (the reference's north-star: >=80% from 1 chip
to N hosts, BASELINE.md).  On this container only one real TPU chip is
reachable, so multi-device numbers come from the virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8) and
validate the sharded program + collectives; wall-clock efficiency is only
meaningful on real multi-chip hardware.

Usage: python -m genomicsdb_tpu.tools.scaling_bench [--devices 1 2 4 8]
Prints one JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import time



def bench_n_devices(n_devices: int, num_samples=64, cells_per_sample=512,
                    region_len=16384, reps=3, weak: bool = False) -> dict:
    import jax

    from ..ops.combine_step import synthesize_cohort
    from ..parallel.sharded import (make_mesh, pad_block_for_mesh,
                                    shard_block, sharded_combine_step)
    n_row = 2 if n_devices % 2 == 0 else 1
    n_pos = n_devices // n_row
    mesh = make_mesh(n_pos, n_row, jax.devices()[:n_devices])
    if weak:
        # fixed work PER DEVICE (position axis grows with the mesh) —
        # the meaningful scaling mode for per-chip throughput claims
        cells_per_sample *= n_pos
        region_len *= n_pos
        num_samples *= n_row
    blk = synthesize_cohort(num_samples, cells_per_sample, region_len,
                            seed=0)
    blk = pad_block_for_mesh(blk, n_pos, n_row)
    args = shard_block(mesh, blk)
    step = sharded_combine_step(mesh, max_merged=4, ploidy=2)
    out = step(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {"devices": n_devices, "seconds": best,
            "records": int(len(blk.starts)),
            "records_per_sec": len(blk.starts) / best}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--weak", action="store_true",
                   help="weak scaling: fixed work per device; efficiency "
                        "= t(1)/t(N) (per-chip throughput held)")
    p.add_argument("--platform", default="cpu",
                   help="jax platform ('cpu' default: a virtual mesh "
                        "sized to max(--devices); 'default' uses the "
                        "environment's backend, e.g. a real pod)")
    args = p.parse_args(argv)
    import os
    if args.platform == "cpu":
        # self-configure the virtual mesh: env-only pins are ignored
        # when a TPU plugin pre-registers, so set the device count and
        # pin via jax.config before the backend initializes
        want = max(args.devices)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={want}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif args.platform != "default":
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    if len(jax.devices()) < max(args.devices):
        raise SystemExit(
            f"scaling_bench: only {len(jax.devices())} device(s) "
            f"available for --devices {args.devices} (platform "
            f"{jax.devices()[0].platform})")
    shared_host = jax.devices()[0].platform == "cpu"
    base = None
    for n in args.devices:
        r = bench_n_devices(n, weak=args.weak)
        if shared_host:
            # virtual devices share physical cores: numbers validate the
            # sharded program + collectives, not hardware scaling
            r["virtual_devices"] = True
        if args.weak:
            if base is None:
                base = r["seconds"]
            r["efficiency"] = round(base / r["seconds"], 3)
        else:
            if base is None:
                base = r["records_per_sec"]
            r["efficiency"] = round(r["records_per_sec"] / (base * n), 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
