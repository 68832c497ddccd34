#!/usr/bin/env python
"""Combine-query benchmark: positions/sec/chip on a synthetic gVCF cohort.

Runs the batched device combine step (genomicsdb_tpu.ops.combine_step) over
a 100+-sample synthetic cohort (BASELINE.json config 5 shape) and prints one
JSON line.  vs_baseline compares against the sequential semantics oracle
(the faithful reimplementation of the reference's per-cell scan +
BroadCombinedGVCF operator) measured on a smaller slice of the same
workload.

MEASUREMENT NOTE: device time is taken on a value the host FETCHES that is
data-dependent on every record (an on-device checksum).  Earlier revisions
timed `block_until_ready`, which the remote axon runtime acknowledges
before compute completes — those numbers (hundreds of M positions/sec)
measured tunnel dispatch latency, not compute, and are invalid.  The
honest per-chip figures, plus the end-to-end cohort pipeline (import ->
block build -> device combine -> VCF text), are in the `detail` field.
The synthetic device workload is much denser than real gVCF data
(~0.6 records/position); the end-to-end cohort number
(`cohort100_end_to_end`) reflects the real-shaped pipeline.
"""

import json
import os
import sys
import time

# make the cpu backend available alongside the TPU platform (the text-edge
# stage pins host-side combine to cpu; see bench_cohort_end_to_end)
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import numpy as np


def bench_device(num_samples=128, cells_per_sample=2048, region_len=262144,
                 chunk=8192, reps=5):
    import jax
    from genomicsdb_tpu.ops.combine_step import (combine_step,
                                                 synthesize_cohort)
    blk = synthesize_cohort(num_samples, cells_per_sample, region_len,
                            seed=0)
    import functools
    fn = functools.partial(combine_step, max_merged=4, ploidy=2)
    fixed = (blk.pl, blk.pl_len, blk.ad, blk.ad_len,
             blk.gt, blk.gq, blk.dp, blk.min_dp, blk.dp_info, blk.info_f,
             blk.info_i, blk.info_fs)
    fixed = tuple(jax.device_put(x) for x in fixed)
    starts = blk.starts
    nb = len(starts)
    pad = (-nb) % chunk

    def padB(x, fill):
        return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                      constant_values=fill)
    recnm = padB(blk.rec_num_merged, 1)
    n_chunks = len(recnm) // chunk
    S = blk.col.shape[0]
    recnm_2d = recnm.reshape(n_chunks, chunk)
    # live matrix + per-record LUTs precomputed on host, as in the
    # production path (store_to_block)
    live_3d = padB(blk.live, -1).reshape(n_chunks, chunk, S)
    inv_4d = padB(blk.inv_bs, -1).reshape(n_chunks, chunk, S, -1)
    nr_3d = padB(blk.nr_bs, -1).reshape(n_chunks, chunk, S)
    recnr_2d = np.ones((n_chunks, chunk), dtype=bool)
    recnm_2d = jax.device_put(recnm_2d)
    live_3d = jax.device_put(live_3d)
    inv_4d = jax.device_put(inv_4d)
    nr_3d = jax.device_put(nr_3d)
    recnr_2d = jax.device_put(recnr_2d)

    # one dispatch: lax.map over chunks (amortizes the axon tunnel's
    # dispatch latency).  The output reduces to ONE scalar fetched to the
    # host: a remote runtime may acknowledge block_until_ready before
    # compute finishes, but a host fetch of a value data-dependent on
    # every record cannot complete early.
    import jax.numpy as jnp

    def chksum(x):
        # int32 wraparound checksum (TPU-native width; int64 reductions
        # go through emulation and have crashed the axon worker).
        # dtype must be explicit: under x64, jnp.sum promotes int32
        # accumulation to int64 like NumPy.
        return jnp.sum(x.astype(jnp.int32), dtype=jnp.int32)

    @jax.jit
    def run_all(inv_4d, nr_3d, recnm_2d, recnr_2d, live_3d, *fixed_args):
        def body(srl):
            out = fn(*fixed_args, srl[0], srl[1], srl[2], srl[3], srl[4])
            # reduce inside the loop: per-chunk scalar, so the map never
            # materializes the full output across all chunks
            return (chksum(out["pl"]) + chksum(out["ad"])
                    + chksum(out["dp_info_sum"]))
        return jnp.sum(jax.lax.map(body, (inv_4d, nr_3d, recnm_2d,
                                          recnr_2d, live_3d)),
                       dtype=jnp.int32)

    chk = int(np.asarray(run_all(inv_4d, nr_3d, recnm_2d, recnr_2d,
                                 live_3d, *fixed)))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        chk2 = int(np.asarray(run_all(inv_4d, nr_3d, recnm_2d, recnr_2d,
                                      live_3d, *fixed)))
        dt = time.perf_counter() - t0
        assert chk2 == chk
        best = dt if best is None else min(best, dt)
    return {
        "positions_per_sec": region_len / best,
        "records_per_sec": nb / best,
        "records": nb,
        "samples": num_samples,
        "seconds": best,
    }


def bench_device_fused(num_samples=128, cells_per_sample=2048,
                       region_len=262144, chunk=8192, reps=5,
                       interpret=False, narrow=False):
    """Fused Pallas path (ops/pallas_combine.py): windowed VMEM gather +
    remap kernel + XLA reductions, one dispatch over all chunks.
    `narrow=True` uses the int16-output kernel (the production setting
    when the fetch pack engages); its checksum is computed on the
    widened values so it must EQUAL the wide kernel's."""
    import functools

    import jax
    import jax.numpy as jnp
    from genomicsdb_tpu.ops.combine_step import (_reduce_math,
                                                 synthesize_cohort)
    from genomicsdb_tpu.ops import jax_kernels as K
    from genomicsdb_tpu.ops import pallas_combine as PC
    blk = synthesize_cohort(num_samples, cells_per_sample, region_len,
                            seed=0)
    S = blk.col.shape[0]
    nb = len(blk.starts)
    # mirror production rt selection (combine_step_fused auto-tries 32
    # with shared windows before 8; VMEM-estimate clamp) — pinning rt=8
    # under-measured the kernel by 27% through round 4
    rt_cands = PC._rt_candidates(0)
    budget = PC._vmem_budget_bytes()
    cfg = None
    for rt in rt_cands:
        c = PC.FusedConfig(
            g_in=blk.pl.shape[2],
            g_out=len(K.genotype_combo_table(4, 2)),
            a_in=blk.ad.shape[2], m=4, gt_w=blk.gt.shape[2],
            f_med=blk.info_f.shape[0], f_imed=blk.info_i.shape[0],
            f_fsum=blk.info_fs.shape[0], ploidy=2, gt_phase=False,
            rt=rt, narrow=narrow)
        if PC.scoped_vmem_estimate(c) <= budget:
            cfg = c
            break
    assert cfg is not None, "no rt candidate fits the VMEM budget"
    rt = cfg.rt
    pay = PC.build_payload(blk, cfg)
    C = pay.shape[2]
    cpad = (-C) % cfg.cb + cfg.cb
    pay = np.pad(pay, ((0, 0), (0, 0), (0, cpad)),
                 constant_values=-2**31)
    pad = (-nb) % chunk

    def padB(x, fill):
        return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                      constant_values=fill)
    live_p = padB(blk.live, -1)
    inv_p = padB(blk.inv_bs, -1)
    nr_p = padB(blk.nr_bs, -1)
    recnm_p = padB(blk.rec_num_merged, 1)
    n_chunks = len(recnm_p) // chunk
    T = chunk // cfg.bt
    if rt > 1:
        # shared per-instance windows (the production default)
        import dataclasses
        n_blocks = pay.shape[2] // cfg.cb
        ws_max = 2
        plans = []
        for i in range(n_chunks):
            p = PC.fused_window_plan_shared(
                live_p[i * chunk:(i + 1) * chunk], cfg, n_blocks)
            assert p is not None, "window premise failed on synthetic"
            plans.append(p[0])
            ws_max = max(ws_max, p[1])
        if ws_max > 2:
            # re-plan every chunk at the final width (the base clamp
            # depends on ws)
            plans = [PC.fused_window_plan_shared(
                live_p[i * chunk:(i + 1) * chunk], cfg, n_blocks,
                max_ws=ws_max, min_ws=ws_max)[0]
                for i in range(n_chunks)]
        cfg = dataclasses.replace(cfg, ws=ws_max)
        w0b = np.stack(plans)                      # [n, T//rt, S]
    else:
        w0b = np.zeros((n_chunks, T, S), np.int32)
        for i in range(n_chunks):
            w = PC.fused_window_plan(live_p[i * chunk:(i + 1) * chunk],
                                     cfg)
            assert w is not None, "window premise failed on synthetic"
            w0b[i] = w
    # per-chunk kernel-layout stacks — NARROW dtypes exactly as the
    # production fused_host_prep ships them (the kernel reads int8/16
    # block DMAs and widens in VMEM)
    live_dt = np.int16 if pay.shape[2] < 2**15 else np.int32
    live_t = np.ascontiguousarray(
        live_p.reshape(n_chunks, chunk, S).transpose(0, 2, 1)
    ).astype(live_dt)[:, :, None]                  # [n, S, 1, chunk]
    inv_t = np.ascontiguousarray(
        inv_p.reshape(n_chunks, chunk, S, -1).transpose(0, 2, 3, 1)
    ).astype(np.int8)                              # [n, S, M, chunk]
    nr_t = np.ascontiguousarray(
        nr_p.reshape(n_chunks, chunk, S).transpose(0, 2, 1)
    ).astype(np.int8)[:, :, None]
    recnm2 = recnm_p.reshape(n_chunks, 1, chunk).astype(np.int8)
    recnr2 = np.ones((n_chunks, 1, chunk), np.int8)
    del_rw = np.zeros((chunk, S), dtype=bool)
    pay_d = jax.device_put(pay)
    stacks = tuple(jax.device_put(x) for x in
                   (w0b, live_t, inv_t, nr_t, recnm2, recnr2))
    del_rw_d = jax.device_put(del_rw)
    live_bs = jax.device_put(
        live_p.reshape(n_chunks, chunk, S).astype(np.int32))

    def chksum(x):
        if x.dtype == jnp.int16:
            # widen kernel-narrowed values so the checksum equals the
            # wide kernel's bit-for-bit
            from genomicsdb_tpu.core import formats as _f
            x32 = x.astype(jnp.int32)
            x32 = jnp.where(x == jnp.int16(-32768),
                            jnp.int32(_f.INT_MISSING), x32)
            x32 = jnp.where(x == jnp.int16(-32767),
                            jnp.int32(_f.INT_VECTOR_END), x32)
            return jnp.sum(x32, dtype=jnp.int32)
        return jnp.sum(x.astype(jnp.int32), dtype=jnp.int32)

    S_n, M_n = S, inv_t.shape[2]

    @jax.jit
    def run_all(pay_d, del_rw_d, live_bs, *stacks):
        def body(args):
            w, lt, it, nt, rm, rn, lbs = args
            if rt > 1:
                T = chunk // cfg.bt
                out = PC.fused_gather_remap_rt(
                    pay_d, lt[:, 0].reshape(S_n, T, cfg.bt),
                    it.reshape(S_n, M_n, T, cfg.bt),
                    nt[:, 0].reshape(S_n, T, cfg.bt),
                    rm[0].reshape(T, cfg.bt), rn[0].reshape(T, cfg.bt),
                    w, cfg=cfg,
                    interpret=interpret)
                out16 = None
                if cfg.narrow:
                    out16 = out[0].reshape(S_n, cfg.vout16, chunk)
                    out = out[1].reshape(S_n, cfg.vout32, chunk)
                else:
                    out = out.reshape(S_n, cfg.vout, chunk)
            else:
                out16 = None
                out = PC.fused_gather_remap(pay_d, lt, it, nt, rm, rn,
                                            w, cfg=cfg,
                                            interpret=interpret)
            post = PC._fused_post(out, del_rw_d, lbs, cfg, chunk,
                                  _reduce_math, None, out16)
            return (chksum(post["pl"]) + chksum(post["ad"])
                    + chksum(post["dp_info_sum"]))
        return jnp.sum(jax.lax.map(body, stacks + (live_bs,)))

    # Amortize the attachment's dispatch+fetch round trip (measured
    # 27 ms through this tunnel — larger than the compute itself): run
    # R full passes on-device inside ONE dispatch and fetch one scalar
    # that data-depends on every record of every pass.  The
    # optimization_barrier threads the accumulator through each pass's
    # inputs so XLA cannot hoist the loop-invariant work out of the
    # fori_loop.
    R = 16

    @jax.jit
    def run_R(pay_d, del_rw_d, live_bs, *stacks):
        def it(_, acc):
            barred = jax.lax.optimization_barrier(
                (acc, pay_d, del_rw_d, live_bs) + stacks)
            acc_b = barred[0]
            return (acc_b + run_all(*barred[1:])).astype(jnp.int32)

        return jax.lax.fori_loop(0, R, it, jnp.int32(0))

    chk1 = int(np.asarray(run_all(pay_d, del_rw_d, live_bs, *stacks)))
    chkR = int(np.asarray(run_R(pay_d, del_rw_d, live_bs, *stacks)))
    with np.errstate(over="ignore"):
        assert np.int32(chkR) == np.int32(np.int64(chk1) * R), \
            (chk1, chkR)
    best = wall1 = None
    for _ in range(reps):
        t0 = time.perf_counter()
        chk2 = int(np.asarray(run_R(pay_d, del_rw_d, live_bs,
                                    *stacks)))
        dt = time.perf_counter() - t0
        assert chk2 == chkR
        best = dt if best is None else min(best, dt)
        t0 = time.perf_counter()
        int(np.asarray(run_all(pay_d, del_rw_d, live_bs, *stacks)))
        dt1 = time.perf_counter() - t0
        wall1 = dt1 if wall1 is None else min(wall1, dt1)
    per_pass = best / R
    return {
        "positions_per_sec": region_len / per_pass,
        "records_per_sec": nb / per_pass,
        "records": nb,
        "samples": num_samples,
        "seconds": per_pass,
        "wall_single_dispatch": wall1,
        "rtt_amortized_over": R,
        "checksum": chk1,
    }


def bench_device_dense(num_samples=128, cells_per_sample=2048,
                       region_len=262144, chunk=8192, reps=5):
    """Device throughput of the PRE-GATHERED path (combine_step_dense):
    the host gathers live cells (gather_block_host) and the device runs
    only the dense remap + reduction math — the PCIe-host production
    configuration.  Measures pure device math; the per-chunk upload is
    excluded (it overlaps compute in a pipelined deployment)."""
    import functools

    import copy

    import jax
    import jax.numpy as jnp
    from genomicsdb_tpu.ops.combine_step import (combine_step_dense,
                                                 gather_block_host,
                                                 synthesize_cohort)
    blk = synthesize_cohort(num_samples, cells_per_sample, region_len,
                            seed=0)
    nb = len(blk.starts)
    recnm = blk.rec_num_merged[:chunk]
    sub = copy.copy(blk)
    sub.inv_bs = blk.inv_bs[:chunk]
    sub.nr_bs = blk.nr_bs[:chunk]
    g = gather_block_host(sub, blk.live[:chunk])
    keys = ("plg", "invg", "pllg", "nrg", "adg", "adlg", "gtg", "gqg",
            "dpfg", "mdpg", "dpig", "infog", "infoig", "infofsg",
            "valid")
    dev = [jax.device_put(g[k]) for k in keys]
    recnm_d = jax.device_put(recnm)
    fn = functools.partial(combine_step_dense, max_merged=4, ploidy=2)

    @jax.jit
    def run(recnm_d, *args):
        out = fn(*args, recnm_d)
        return (jnp.sum(out["pl"].astype(jnp.int32), dtype=jnp.int32)
                + jnp.sum(out["ad"].astype(jnp.int32), dtype=jnp.int32)
                + jnp.sum(out["dp_info_sum"].astype(jnp.int32),
                          dtype=jnp.int32))

    chk = int(np.asarray(run(recnm_d, *dev)))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        chk2 = int(np.asarray(run(recnm_d, *dev)))
        dt = time.perf_counter() - t0
        assert chk2 == chk
        best = dt if best is None else min(best, dt)
    scale = chunk / nb
    return {
        "records_per_sec": chunk / best,
        "positions_per_sec": region_len * scale / best,
        "records": chunk,
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


def bench_cpp_baseline(num_samples=128, cells_per_sample=2048,
                       region_len=262144):
    """C++-speed sequential combine on the SAME cohort as bench_device
    (runtime/native/seq_bench.cpp): the reference's per-record per-call
    hot loop at compiled speed.  This is the primary vs_baseline anchor;
    the Python oracle stays as a secondary line."""
    import ctypes

    from genomicsdb_tpu.ops.combine_step import synthesize_cohort
    from genomicsdb_tpu.runtime import native_loader
    lib = native_loader.get_lib()
    if lib is None:
        return None
    blk = synthesize_cohort(num_samples, cells_per_sample, region_len,
                            seed=0)
    i64 = ctypes.c_int64
    fn = lib.gdb_seq_combine_bench
    fn.restype = ctypes.c_int32
    fn.argtypes = [np.ctypeslib.ndpointer(np.int64),
                   np.ctypeslib.ndpointer(np.int64), i64, i64,
                   np.ctypeslib.ndpointer(np.int32), i64,
                   np.ctypeslib.ndpointer(np.int32),
                   np.ctypeslib.ndpointer(np.int32), i64,
                   np.ctypeslib.ndpointer(np.int32),
                   np.ctypeslib.ndpointer(np.int32),
                   np.ctypeslib.ndpointer(np.int32), i64,
                   np.ctypeslib.ndpointer(np.int32),
                   np.ctypeslib.ndpointer(np.int32),
                   np.ctypeslib.ndpointer(np.int32),
                   np.ctypeslib.ndpointer(np.int64),
                   np.ctypeslib.ndpointer(np.int32), i64]
    S, C = blk.col.shape
    B = len(blk.starts)
    args = (np.ascontiguousarray(blk.col),
            np.ascontiguousarray(blk.end), S, C,
            np.ascontiguousarray(blk.pl), blk.pl.shape[2],
            np.ascontiguousarray(blk.pl_len),
            np.ascontiguousarray(blk.ad), blk.ad.shape[2],
            np.ascontiguousarray(blk.ad_len),
            np.ascontiguousarray(blk.inv_bs),
            np.ascontiguousarray(blk.nr_bs), blk.inv_bs.shape[2],
            np.ascontiguousarray(blk.dp_info),
            np.ascontiguousarray(blk.dp),
            np.ascontiguousarray(blk.min_dp),
            np.ascontiguousarray(blk.starts),
            np.ascontiguousarray(blk.rec_num_merged), B)
    chk = fn(*args)          # warm
    t0 = time.perf_counter()
    chk2 = fn(*args)
    dt = time.perf_counter() - t0
    assert chk2 == chk
    out = {
        "positions_per_sec": region_len / dt,
        "records_per_sec": B / dt,
        "records": int(B),
        "seconds": dt,
        "checksum": int(chk),
    }
    # multi-threaded variant: records range-partitioned across all
    # cores — the reference's rank-per-partition process model
    # (vcf2tiledb.cc:44-52) run thread-per-core.  Checksum must equal
    # the single-threaded run (commutative int32 wraparound sum).
    n_threads = os.cpu_count() or 1
    fn_mt = lib.gdb_seq_combine_bench_mt
    fn_mt.restype = ctypes.c_int32
    fn_mt.argtypes = fn.argtypes + [i64]
    chk_mt = fn_mt(*args, n_threads)   # warm
    t0 = time.perf_counter()
    chk_mt2 = fn_mt(*args, n_threads)
    dt_mt = time.perf_counter() - t0
    assert chk_mt == chk and chk_mt2 == chk, (chk_mt, chk)
    out["mt_threads"] = n_threads
    out["mt_positions_per_sec"] = region_len / dt_mt
    out["mt_seconds"] = dt_mt
    return out


def bench_import(n_records=20000, n_samples=8, tmpdir="/tmp"):
    """Import throughput: native columnar-direct loader vs the Python
    reference path, cells/sec."""
    import os
    import random
    random.seed(0)
    path = os.path.join(tmpdir, "bench_cohort.vcf")
    samples = [f"S{i}" for i in range(n_samples)]
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        for line in [
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
            '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="m">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
            '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
            '##contig=<ID=1,length=249250621>',
        ]:
            f.write(line + "\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(samples) + "\n")
        pos = 1
        for i in range(n_records):
            end = pos + random.randint(10, 200)
            cells = "\t".join(
                f"0/0:{random.randint(1, 60)}:0:0:0,0,0"
                for _ in range(n_samples))
            f.write(f"1\t{pos}\t.\tC\t<NON_REF>\t.\t.\tEND={end}\t"
                    f"GT:DP:GQ:MIN_DP:PL\t{cells}\n")
            pos = end + 1
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store.fast_import import fast_import_file
    from genomicsdb_tpu.store.import_pipeline import (VCFCellConverter,
                                                      import_callsets)
    vid = VidMapper.from_files("/root/reference/tests/inputs/vid.json")
    idx_to_row = {i: i for i in range(n_samples)}
    t0 = time.perf_counter()
    st = fast_import_file(path, vid, idx_to_row)
    t_fast = time.perf_counter() - t0
    n_cells = st.num_cells if st is not None else 0
    from genomicsdb_tpu.vcf.reader import VCFFile
    t0 = time.perf_counter()
    conv = VCFCellConverter(VCFFile(path), vid, idx_to_row)
    cells = conv.convert()
    t_py = time.perf_counter() - t0
    os.unlink(path)
    out = {
        "cells": n_cells,
        "native_cells_per_sec": n_cells / t_fast if t_fast else 0,
        "python_cells_per_sec": len(cells) / t_py,
        "speedup": t_py / t_fast if t_fast else 0,
    }
    out["asa"] = _bench_import_asa(n_records, n_samples, tmpdir)
    return out


def _bench_import_asa(n_records, n_samples, tmpdir):
    """Import throughput with EVERY record carrying allele-specific
    2-D INFO annotations (AS_RAW_MQ element_wise_sum + AS_RAW_MQRankSum
    histogram tuple) — the GATK-production annotation shape the round-4
    verdict flagged as silently dropping to the Python converter.
    Parses through fast_import's ragged2d path
    (genomicsdb_multid_vector_field.h:87 parity)."""
    import random
    random.seed(3)
    path = os.path.join(tmpdir, "bench_cohort_asa.vcf")
    samples = [f"S{i}" for i in range(n_samples)]
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        for line in [
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
            '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="m">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
            '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
            '##INFO=<ID=AS_RAW_MQ,Number=1,Type=String,Description="a">',
            '##INFO=<ID=AS_RAW_MQRankSum,Number=1,Type=String,'
            'Description="h">',
            '##contig=<ID=1,length=249250621>',
        ]:
            f.write(line + "\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(samples) + "\n")
        pos = 1
        for i in range(n_records):
            end = pos + random.randint(10, 200)
            mq = (f"{random.random()*40:.2f},{random.random()*40:.2f}"
                  f"|{random.random()*40:.2f}")
            rs = (f"|{random.random():.1f},{random.randint(1, 9)},"
                  f"{random.random():.1f},{random.randint(1, 9)}")
            cells = "\t".join(
                f"0/0:{random.randint(1, 60)}:0:0:0,0,0"
                for _ in range(n_samples))
            f.write(f"1\t{pos}\t.\tC\t<NON_REF>\t.\t.\tEND={end};"
                    f"AS_RAW_MQ={mq};AS_RAW_MQRankSum={rs}\t"
                    f"GT:DP:GQ:MIN_DP:PL\t{cells}\n")
            pos = end + 1
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store.fast_import import fast_import_file
    vid = VidMapper.from_files(
        "/root/reference/tests/inputs/vid_all_asa.json")
    idx_to_row = {i: i for i in range(n_samples)}
    st = fast_import_file(path, vid, idx_to_row)   # warm (page cache)
    if st is None:
        os.unlink(path)
        return {"error": "fast path declined the ASA cohort"}
    t_fast = None
    for _ in range(3):
        t0 = time.perf_counter()
        st = fast_import_file(path, vid, idx_to_row)
        dt = time.perf_counter() - t0
        t_fast = dt if t_fast is None else min(t_fast, dt)
    os.unlink(path)
    return {
        "cells": int(st.num_cells),
        "native_cells_per_sec": st.num_cells / t_fast if t_fast else 0,
    }


def bench_out_of_core(target_bytes=2e9):
    """Out-of-core serving: a ~2 GB single-fragment partition is built
    by streaming writes and queried whole in segment_size (10 MB)
    windows — in a FRESH subprocess so peak RSS is this workload's.
    The claim recorded: peak RSS stays a small constant fraction of the
    partition (the reference's segment-granular TileDB serving,
    variant_storage_manager.cc:478-513)."""
    import subprocess
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable, "-m", "genomicsdb_tpu.tools.ooc_bench",
         "--target-bytes", str(target_bytes)],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if r.returncode != 0:
        return {"error": (r.stderr or "")[-300:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def bench_wide_cohort():
    """1000-sample chromosome-scale lane (GATK joint-genotyping width):
    cells/sec, positions/sec, interval p50/p90 — fresh CPU-pinned
    subprocess (tools/wide_cohort_bench.py; sampled-window sequential
    equivalence is pinned by tests/test_wide_cohort.py)."""
    import subprocess
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""
    r = subprocess.run(
        [sys.executable, "-m",
         "genomicsdb_tpu.tools.wide_cohort_bench", "--skip-seq"],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if r.returncode != 0:
        return {"error": (r.stderr or "")[-300:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def bench_stream_latency():
    """Socket-stream interval latency (the GATK/Spark split-serving
    pattern): p50/p90 of 10 kb interval queries against the 200k-record
    store through the external TCP attachment, one-shot and persistent
    connections (tools/stream_latency_bench.py — the reproducible form
    of the docs/performance.md latency figures; round-4 verdict asked
    for this lane to be driver-audited)."""
    import subprocess
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""
    r = subprocess.run(
        [sys.executable, "-m",
         "genomicsdb_tpu.tools.stream_latency_bench"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if r.returncode != 0:
        return {"error": (r.stderr or "")[-300:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def bench_process_scaling():
    """Strong scaling across worker PROCESSES (the reference's MPI
    rank-per-partition model; the measurable stand-in for the >=80%
    1->N efficiency target while real multi-chip is unavailable):
    1/2/4 pinned ranks over an equally-partitioned workspace, outputs
    byte-identical across rank counts (tools/scaling_bench.py)."""
    import subprocess
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""
    r = subprocess.run(
        [sys.executable, "-m", "genomicsdb_tpu.tools.scaling_bench",
         "--records", "600000"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if r.returncode != 0:
        return {"error": (r.stderr or "")[-300:]}
    return json.loads(r.stdout.strip().splitlines()[-1])


def bench_cohort_end_to_end(n_samples=100, n_records=4000,
                            tmpdir="/tmp"):
    """Full pipeline on a 100-sample cohort (BASELINE config 5 shape):
    VCF text -> native import -> store->device block -> device combine.
    Reports per-stage seconds + end-to-end positions/sec."""
    import os
    import random
    random.seed(1)
    path = os.path.join(tmpdir, "bench_cohort100.vcf")
    samples = [f"S{i}" for i in range(n_samples)]
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        for line in [
            '##ALT=<ID=NON_REF,Description="n">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
            '##FORMAT=<ID=AD,Number=.,Type=Integer,Description="a">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
            '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="m">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
            '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
            '##INFO=<ID=BaseQRankSum,Number=1,Type=Float,Description="b">',
            '##contig=<ID=1,length=249250621>',
        ]:
            f.write(line + "\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(samples) + "\n")
        pos = 1
        for i in range(n_records):
            if i % 20 == 19:  # variant site
                cells = "\t".join(
                    f"0/1:{random.randint(1,40)},{random.randint(1,40)},0:"
                    f"{random.randint(10,99)}:{random.randint(10,99)}:.:"
                    f"{random.randint(0,500)},0,{random.randint(0,500)},"
                    f"{random.randint(0,500)},{random.randint(0,500)},"
                    f"{random.randint(0,500)}"
                    for _ in range(n_samples))
                f.write(f"1\t{pos}\t.\tC\tA,<NON_REF>\t50\t.\t"
                        f"BaseQRankSum={random.random():.3f}\t"
                        f"GT:AD:DP:GQ:MIN_DP:PL\t{cells}\n")
                pos += 1
            else:
                end = pos + random.randint(50, 400)
                cells = "\t".join(
                    f"0/0:.:{random.randint(1,60)}:0:0:0,0,0"
                    for _ in range(n_samples))
                f.write(f"1\t{pos}\t.\tC\t<NON_REF>\t.\t.\tEND={end}\t"
                        f"GT:AD:DP:GQ:MIN_DP:PL\t{cells}\n")
                pos = end + 1
    region_len = pos
    import jax
    from genomicsdb_tpu.core.config import QueryParams
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.ops.combine_step import block_to_args, combine_step
    from genomicsdb_tpu.ops.store_block import store_to_block
    from genomicsdb_tpu.query import driver
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    vid = VidMapper.from_files("/root/reference/tests/inputs/vid.json")
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    t0 = time.perf_counter()
    store = import_callsets(vid)
    t_import = time.perf_counter() - t0
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    t0 = time.perf_counter()
    blk = store_to_block(store, qc, interval=(0, region_len),
                         max_merged=4, ploidy=2)
    t_block = time.perf_counter() - t0
    import jax.numpy as jnp

    def _run_device():
        # sync on ONE data-dependent scalar: block_until_ready on the
        # 15-leaf output dict pays a tunnel round trip PER LEAF (and
        # this runtime may ack it before compute completes — see the
        # methodology note at the top of this file)
        out = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
        return int(np.asarray(
            jnp.sum(out["pl"], dtype=jnp.int32)
            + jnp.sum(out["ad"], dtype=jnp.int32)
            + jnp.sum(out["dp_info_sum"]).astype(jnp.int32)))

    t0 = time.perf_counter()
    chk = _run_device()
    t_compile_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    chk2 = _run_device()
    t_device = time.perf_counter() - t0
    assert chk2 == chk
    # full combined-VCF text through the hybrid block engine.  The text
    # edge is host work; pin its combine to the CPU backend so the
    # number reflects the pipeline, not the debug-tunnel's device->host
    # transfer bandwidth (the device stage is measured above on TPU).
    try:
        cpu_dev = jax.devices("cpu")[0]
    except RuntimeError:
        cpu_dev = None

    def _run_text():
        qc2 = driver.make_query_config(qp, vid)
        if cpu_dev is not None:
            with jax.default_device(cpu_dev):
                return driver.run_vcf_query_block(store, qc2, qp, vid,
                                                  template_path=None,
                                                  reference_path=None)
        return driver.run_vcf_query_block(store, qc2, qp, vid,
                                          template_path=None,
                                          reference_path=None)

    # warm run first: the text stage jit-compiles for the CPU backend
    # inside this (TPU) process, and that one-time XLA-CPU compile (~5s)
    # otherwise dominates the throughput figure.  Cold time is reported
    # separately as vcf_text_cold_s.  The serving index is disabled:
    # this lane measures the ENGINE (the index would materialize on the
    # warm repeat and serve a slice of itself).
    os.environ["GENOMICSDB_TPU_SERVING_INDEX"] = "0"
    try:
        t0 = time.perf_counter()
        text = _run_text()
        t_text_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        text2 = _run_text()
        t_text = time.perf_counter() - t0
    finally:
        del os.environ["GENOMICSDB_TPU_SERVING_INDEX"]
    assert text2 == text, "text phase not deterministic across runs"
    n_lines = text.count("\n")
    os.unlink(path)
    # The reference splits the loader (vcf2tiledb) from the query tool
    # (gt_mpi_gather); its combine-throughput north star is QUERY-side.
    # The warm text run IS the full query pipeline — store->block,
    # device combine, and VCF text render — on a store-resident
    # workspace, so it is the apples-to-apples end-to-end figure.
    # Import cost is reported alongside (and benched in `import`).
    return {
        "samples": n_samples,
        "records": int(len(blk.starts)),
        "positions": int(region_len),
        "import_s": t_import,
        "block_build_s": t_block,
        "device_s": t_device,
        "compile_s": t_compile_run - t_device,
        "end_to_end_positions_per_sec": region_len / t_text,
        "with_import_positions_per_sec": region_len / (
            t_import + t_text),
        "vcf_text_records": n_lines,
        "vcf_text_cold_s": t_text_cold,
        "vcf_text_s": t_text,
        "vcf_text_positions_per_sec": region_len / t_text,
    }


def _probe_device(retries=3, wait_s=120) -> bool:
    """The remote TPU tunnel occasionally wedges (hangs on any dispatch,
    recovers after minutes).  Probe it in a SUBPROCESS with a timeout —
    an in-process hang cannot be interrupted — and retry with backoff.
    Returns False when the device stays unreachable."""
    import subprocess
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat.split(",")[0] in ("cpu", ""):
        return True
    code = "import jax, jax.numpy as jnp; print(int(jnp.arange(4).sum()))"
    for i in range(retries):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=150)
            if r.returncode == 0 and b"6" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < retries:
            time.sleep(wait_s)
    return False


def _run_chip_lane(timeout=2400):
    """Run the real-chip pytest lane (`-m tpu`) and return
    {"passed": N, "failed": M, ...}.  The lane reuses the persistent
    compile cache, so after a bench run it is minutes, not an hour.  A
    chip regression (round-3 style: kernel config that no longer
    compiles) can therefore never ship silently inside a green bench."""
    import re
    import subprocess
    if os.environ.get("GENOMICSDB_TPU_BENCH_TPULANE", "1") == "0":
        return {"skipped": "GENOMICSDB_TPU_BENCH_TPULANE=0"}
    env = dict(os.environ)
    env.pop("GENOMICSDB_TPU_BENCH_CHILD", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    stdout = ""
    timed_out = False
    try:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-m", "tpu",
             "tests/test_tpu_lane.py", "-v", "--no-header"],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        stdout = r.stdout or ""
    except subprocess.TimeoutExpired as e:
        # salvage the per-test -v lines that completed before the
        # overall lane budget expired
        timed_out = True
        stdout = (e.stdout or b"")
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
    tail = stdout.strip().splitlines()[-1:]
    out = {"passed": 0, "failed": 0, "skipped": 0}
    for key in out:
        m = re.search(rf"(\d+) {key}", tail[0] if tail else "")
        if m:
            out[key] = int(m.group(1))
    if timed_out:
        for key, marker in (("passed", " PASSED"), ("failed", " FAILED"),
                            ("skipped", " SKIPPED")):
            out[key] = stdout.count(marker)
        out["error"] = "chip lane timed out; counts are partial"
    out["summary"] = tail[0] if tail else ""
    return out


def main():
    """Supervisor: run the real bench in a child process with a hard
    timeout.  The TPU tunnel can wedge MID-RUN (a dispatch hangs forever
    and cannot be interrupted in-process); on timeout or failure, retry
    the child on the CPU backend so a round always records a line."""
    import subprocess
    if os.environ.get("GENOMICSDB_TPU_BENCH_CHILD"):
        return _bench_impl()
    env = dict(os.environ)
    env["GENOMICSDB_TPU_BENCH_CHILD"] = "1"
    # persistent compile cache cuts repeated-run compile time
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    try:
        # cold remote-AOT compiles of the big-chunk programs take several
        # minutes each; the persistent compile cache makes reruns fast
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, timeout=2700, env=env,
                           text=True)
        if r.returncode == 0 and r.stdout.strip():
            _emit(r.stdout, run_lane=True)
            return
    except subprocess.TimeoutExpired:
        pass
    env["JAX_PLATFORMS"] = "cpu"
    # a wedged axon tunnel blocks backend DISCOVERY even under
    # JAX_PLATFORMS=cpu: the fallback child must not register the plugin
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["GENOMICSDB_TPU_BENCH_NOTE"] = "tpu-hung-cpu-fallback"
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       capture_output=True, timeout=1800, env=env,
                       text=True)
    if r.returncode == 0 and r.stdout.strip():
        _emit(r.stdout, run_lane=False)
    else:
        sys.stderr.write(r.stderr[-2000:] + "\n")
        raise SystemExit(1)


def _emit(child_stdout: str, run_lane: bool):
    """Parse the child's full-result line, persist it to BENCH.json,
    and print exactly ONE COMPACT JSON line on stdout (BENCH_r03's
    `parsed: null` came from the multi-KB detail dict being truncated
    by the capture — the full detail now lives in the artifact)."""
    full = json.loads(child_stdout.strip().splitlines()[-1])
    if run_lane and full["detail"].get("platform_note") is None \
            and os.environ.get("JAX_PLATFORMS", "").split(",")[0] \
            not in ("cpu",):
        full["detail"]["chip_lane"] = _run_chip_lane()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH.json")
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # regenerate the docs' source-of-truth table from this exact file
    # (round-4 verdict: hand-maintained docs figures kept drifting)
    try:
        from genomicsdb_tpu.tools.perf_table import write_table
        write_table(path)
    except Exception as e:
        sys.stderr.write(f"perf_table generation failed: {e}\n")
    d = full["detail"]

    def pick(*keys, src=None):
        cur = src if src is not None else d
        for k in keys:
            if not isinstance(cur, dict) or k not in cur:
                return None
            cur = cur[k]
        return cur
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "vs_baseline_mt": full.get("vs_baseline_mt"),
        "fused_positions_per_sec":
            pick("device_fused_pallas", "positions_per_sec"),
        "wide1024_cells_per_sec":
            pick("device_fused_wide_1024_samples", "cells_per_sec"),
        "import_cells_per_sec": pick("import", "native_cells_per_sec"),
        "e2e_positions_per_sec":
            pick("cohort100_end_to_end", "end_to_end_positions_per_sec"),
        "wide_cohort_1000":
            {k: v for k, v in (pick("wide_cohort_1000") or {}).items()
             if k in ("cells_per_sec", "query_warm_s",
                      "interval_10kb_p50_ms", "import_s", "error")},
        "process_scaling": {
            k: {"eff_pct": v.get("efficiency_pct"),
                "eff_spawn_pct": v.get("efficiency_spawn_pct"),
                "eff_compute_pct": v.get("efficiency_compute_pct")}
            for k, v in ((pick("process_scaling") or {})
                         .get("ranks", {})).items()},
        "stream_latency": {
            k: v for k, v in (pick("stream_latency") or {}).items()
            if k in ("socket_p50_ms", "socket_p90_ms",
                     "persistent_p50_ms", "persistent_p90_ms",
                     "engine_persistent_p50_ms", "socket_min_ms",
                     "error")},
        "chip_lane": {k: v for k, v in (pick("chip_lane") or {}).items()
                      if k != "summary"},
        "platform_note": pick("platform_note"),
        "detail_file": "BENCH.json",
    }
    print(json.dumps(compact))


def _bench_impl():
    platform_note = os.environ.get("GENOMICSDB_TPU_BENCH_NOTE")
    if not _probe_device():
        # dead tunnel: fall back to CPU so the round still records a line
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        platform_note = "tpu-unreachable-cpu-fallback"
    dev = bench_device()
    import jax as _jax
    if _jax.default_backend() in ("tpu", "axon"):
        try:
            fused = bench_device_fused()
        except Exception as e:  # window premise / Mosaic regression
            fused = {"error": str(e)[:200]}
        try:
            # production cohort width: 1024 samples (8x) costs ~7.2x —
            # cell throughput per second rises with width
            wide = bench_device_fused(num_samples=1024,
                                      cells_per_sample=256,
                                      region_len=32768, reps=3)
            wide["cells_per_sec"] = round(
                wide["records_per_sec"] * wide["samples"], 1)
        except Exception as e:
            wide = {"error": str(e)[:200]}
    else:
        fused = {"skipped": "compiled pallas needs the TPU backend"}
        wide = {"skipped": "compiled pallas needs the TPU backend"}
    dense = bench_device_dense()
    oracle = bench_oracle()
    cpp = bench_cpp_baseline()
    imp = bench_import()
    e2e = bench_cohort_end_to_end()
    try:
        ooc = bench_out_of_core()
    except Exception as e:
        ooc = {"error": str(e)[:200]}
    try:
        wide1000 = bench_wide_cohort()
    except Exception as e:
        wide1000 = {"error": str(e)[:200]}
    try:
        scaling = bench_process_scaling()
    except Exception as e:
        scaling = {"error": str(e)[:200]}
    try:
        latency = bench_stream_latency()
    except Exception as e:
        latency = {"error": str(e)[:200]}
    value = max(dev["positions_per_sec"],
                fused.get("positions_per_sec", 0))
    # primary baseline: the C++-speed sequential engine on the same
    # cohort (runtime/native/seq_bench.cpp); Python oracle is secondary
    base = cpp["positions_per_sec"] if cpp else \
        oracle["positions_per_sec"]
    vs = value / base
    # the honest system-level ratio: one chip vs the sequential engine
    # running rank-per-core on every host core
    vs_mt = value / cpp["mt_positions_per_sec"] \
        if cpp and cpp.get("mt_positions_per_sec") else None
    line = {
        "metric": "combine_positions_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "positions/sec",
        "vs_baseline": round(vs, 2),
        "vs_baseline_mt": round(vs_mt, 2) if vs_mt else None,
        "detail": {
            "device": {k: round(v, 2) if isinstance(v, float) else v
                       for k, v in dev.items()},
            "device_fused_pallas": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in fused.items()},
            "device_fused_wide_1024_samples": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in wide.items()},
            "device_dense_pregathered": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in dense.items()},
            "oracle_positions_per_sec":
                round(oracle["positions_per_sec"], 1),
            "cpp_sequential_baseline": {
                k: round(v, 1) if isinstance(v, float) else v
                for k, v in (cpp or {}).items()},
            "vs_python_oracle":
                round(value / oracle["positions_per_sec"], 2),
            "import": {k: round(v, 1) if isinstance(v, float) else v
                       for k, v in imp.items()},
            "cohort100_end_to_end": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in e2e.items()},
            "out_of_core": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in ooc.items()},
            "wide_cohort_1000": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in wide1000.items()},
            "process_scaling": scaling,
            "stream_latency": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in latency.items()},
        },
    }
    if platform_note:
        line["detail"]["platform_note"] = platform_note
    print(json.dumps(line))


if __name__ == "__main__":
    main()
