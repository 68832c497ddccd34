"""Block-based combined-VCF production (the scaled output path).

Renders VCF text records from device combine-step outputs instead of the
sequential per-cell engine — SURVEY.md §7.5's "output edge fed by
fixed-layout device output buffers".  Records containing deletions fall
back to the sequential engine for the affected span (spanning-deletion
rewrites are control-flow-heavy and rare); everything else renders from
the batched arrays.

Byte-compatible with CombineToVCF for deletion-free cohorts
(tests/test_block_writer.py cross-validates).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core import formats
from ..core.config import QueryConfig
from ..core.vid import VidMapper
from ..ops.combine_step import block_to_args, combine_step
from ..ops.store_block import store_to_block
from ..runtime import native_loader
from ..store.columnar import ColumnarStore
from ..vcf.fasta import ReferenceGenome

INT_MISSING = formats.INT_MISSING
LEGAL = {"A", "T", "G", "C"}


def jnp_backend_is_tpu() -> bool:
    import jax
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False

# default INFO median field order matches store_to_block's default
INFO_FIELD_VCF_ORDER = ["BaseQRankSum", "ClippingRankSum", "MQRankSum",
                        "ReadPosRankSum", "MQ", "MQ0"]


def render_block_vcf(store: ColumnarStore, qc: QueryConfig,
                     vid: VidMapper,
                     interval,
                     ref_genome: Optional[ReferenceGenome] = None,
                     max_merged: int = 4, ploidy: int = 2,
                     sequential_fn=None,
                     pad_records: Optional[int] = None,
                     pad_cells_to: int = 1) -> List[str]:
    """Combined records for `interval` via the device pipeline.

    `sequential_fn(lo, hi) -> List[str]`: when given, maximal runs of
    records whose live cells contain a deletion are rendered by the
    sequential engine over [lo, hi] and spliced in (spanning-deletion
    rewrites are control-flow-heavy and rare); without it, deletion
    records render from the batched arrays (deletion-free semantics).
    """
    blk, meta = store_to_block(store, qc, interval=interval,
                               max_merged=max_merged, ploidy=ploidy,
                               return_meta=True, pad_records=pad_records,
                               pad_cells_to=pad_cells_to)
    import os as _os
    if _os.environ.get("GENOMICSDB_TPU_DENSE") == "1":
        # PCIe-host configuration: live-cell gather on the host, device
        # runs only dense math (docs/performance.md; ~4x on-chip)
        from ..ops.combine_step import (combine_step_dense,
                                        gather_block_host)
        g = gather_block_host(blk, blk.live)
        out = combine_step_dense(
            g["plg"], g["invg"], g["pllg"], g["nrg"], g["adg"],
            g["adlg"], g["gtg"], g["gqg"], g["dpfg"], g["mdpg"],
            g["dpig"], g["infog"], g["rmqg"], g["valid"],
            blk.rec_num_merged, max_merged=max_merged, ploidy=ploidy)
        live = np.asarray(blk.live)
    else:
        use_pallas = (_os.environ.get("GENOMICSDB_TPU_PALLAS") == "1"
                      and jnp_backend_is_tpu())
        out = combine_step(*block_to_args(blk), max_merged=max_merged,
                           ploidy=ploidy, use_pallas=use_pallas)
        live = np.asarray(out["live"])
    pl = np.asarray(out["pl"])
    ad = np.asarray(out["ad"])
    gt = np.asarray(out["gt"])
    gq = np.asarray(out["gq"])
    dpf = np.asarray(out["dp_format"])
    mindp = np.asarray(out["min_dp"])
    med = np.asarray(out["info_median"])
    med_ok = np.asarray(out["info_median_ok"])
    rmq = np.asarray(out["raw_mq_sum"])
    rmq_ok = np.asarray(out["raw_mq_ok"])
    dpsum = np.asarray(out["dp_info_sum"])
    B, S = live.shape
    info_names = [f for f in INFO_FIELD_VCF_ORDER if f in store.fields]
    info_is_float = {f: store.fields[f].dtype == "float32"
                     for f in info_names}

    def fmt_info(name, v):
        if info_is_float.get(name, True):
            return formats.format_float_vcf(v)
        return str(int(v))
    lines: List[str] = []
    groups: dict = {}
    order: list = []
    starts = blk.starts
    # vectorized per-record presence flags (a per-record np.any was ~40%
    # of genome-scale render time)
    any_live_v = (live >= 0).any(axis=1)
    have_ad_v = (ad[:, :, 0] != INT_MISSING).any(axis=1)
    have_pl_v = (pl[:, :, 0] != INT_MISSING).any(axis=1)
    have_gq_v = (gq != INT_MISSING).any(axis=1)
    have_mindp_v = (mindp != INT_MISSING).any(axis=1)
    have_dp_v = (dpf != INT_MISSING).any(axis=1)
    emitted = [b for b in np.nonzero(any_live_v)[0]]
    # plan: ("block", order_idx) | ("seq", lo, hi) splice points
    plan: list = []
    e = 0
    block_bs = []
    while e < len(emitted):
        b = emitted[e]
        if sequential_fn is not None and meta.needs_fallback[b]:
            j = e
            while j < len(emitted) and meta.needs_fallback[emitted[j]]:
                j += 1
            hi = int(starts[emitted[j]]) - 1 if j < len(emitted) \
                else int(interval[1])
            plan.append(("seq", int(starts[b]), hi))
            e = j
            continue
        plan.append(("block", b))
        block_bs.append(b)
        e += 1
    # vectorized coordinate/contig resolution for the prefix loop
    starts_l = starts.tolist()
    ends_l = meta.ends.tolist()
    c_offsets = np.asarray(vid._contig_offsets, dtype=np.int64)
    c_idx = np.searchsorted(c_offsets, starts, side="right") - 1
    c_names = [c.name for c in vid._contigs_by_offset]
    if block_bs:
        # bounds check matching get_contig_location: every rendered start
        # must fall inside [offset, offset+length) of its resolved contig
        bs_arr = np.asarray(block_bs)
        bidx = c_idx[bs_arr]
        c_lengths = np.asarray(
            [c.length for c in vid._contigs_by_offset], dtype=np.int64)
        bad = (bidx < 0) | (starts[bs_arr]
                            >= c_offsets[np.maximum(bidx, 0)]
                            + c_lengths[np.maximum(bidx, 0)])
        if bad.any():
            b0 = int(bs_arr[np.argmax(bad)])
            raise ValueError(
                f"record start {int(starts[b0])} outside every contig "
                "(vid contig map does not cover this column)")
    c_idx_l = np.maximum(c_idx, 0).tolist()
    c_offs_l = c_offsets.tolist()
    for b in block_bs:
        start = starts_l[b]
        rec_end = ends_l[b]
        ci = c_idx_l[b]
        contig = c_names[ci]
        cpos = start - c_offs_l[ci]
        ref = meta.refs[b]
        if ref is None or (len(ref) == 1 and ref == "N"):
            base = ref_genome.base_at(contig, cpos) if ref_genome else "N"
            ref = base if base in LEGAL else "N"
        alts = meta.alts[b]
        alt_txt = ",".join("<NON_REF>" if a.startswith("&") else a
                           for a in alts) or "."
        info_parts = []
        if rec_end > start:
            info_parts.append(f"END={cpos + 1 + (rec_end - start)}")
        if not meta.is_ref_block_only[b]:
            # vid INFO order: RankSums, MQ, RAW_MQ(sum), MQ0
            for fi, name in enumerate(info_names):
                if name == "MQ0":
                    continue
                if med_ok[fi, b]:
                    info_parts.append(
                        f"{name}={fmt_info(name, med[fi, b])}")
            if rmq_ok[b]:
                info_parts.append(
                    f"RAW_MQ={formats.format_float_vcf(rmq[b])}")
            if "MQ0" in info_names:
                fi = info_names.index("MQ0")
                if med_ok[fi, b]:
                    info_parts.append(
                        f"MQ0={fmt_info('MQ0', med[fi, b])}")
        if dpsum[b] > 0 and not meta.is_ref_block_only[b]:
            info_parts.append(f"DP={int(dpsum[b])}")
        # FORMAT assembly (GT first; only fields with any valid value)
        fmt = ["GT"]
        have_ad = bool(have_ad_v[b])
        have_pl = bool(have_pl_v[b])
        have_gq = bool(have_gq_v[b])
        have_mindp = bool(have_mindp_v[b])
        have_dp = bool(have_dp_v[b])
        if have_gq:
            fmt.append("GQ")
        if have_ad:
            fmt.append("AD")
        if have_pl:
            fmt.append("PL")
        if have_mindp:
            fmt.append("MIN_DP")
        if have_dp:
            fmt.append("DP")
        prefix = "\t".join(
            [contig, str(cpos + 1), ".", ref, alt_txt, ".", ".",
             ";".join(info_parts) if info_parts else ".",
             ":".join(fmt)])
        sig = (have_gq, have_ad, have_pl, have_mindp, have_dp)
        groups.setdefault(sig, []).append(len(order))
        order.append((b, prefix, sig))
    # Batched sample-column rendering: per FORMAT signature group, render
    # each field's [R, S] values as ragged text natively, join fields with
    # ':' and samples with '\t' (runtime/native/vcf_kernels.cpp render
    # kernels).  Falls back to a Python loop without the native lib.
    rec_text: List[Optional[str]] = [None] * len(order)
    if native_loader.get_lib() is None:
        for oi, (b, _, sig) in enumerate(order):
            rec_text[oi] = _render_samples_py(
                sig, live[b], gt[b], gq[b], ad[b], pl[b], mindp[b],
                dpf[b], int(blk.rec_num_merged[b]), ploidy)
    else:
        for sig, ois in groups.items():
            bs = np.array([order[oi][0] for oi in ois])
            texts = _render_samples_native(
                sig, bs, live, gt, gq, ad, pl, mindp, dpf,
                np.asarray(blk.rec_num_merged), ploidy)
            for oi, t in zip(ois, texts):
                rec_text[oi] = t
    block_lines = {order[oi][0]: order[oi][1] + "\t" + rec_text[oi]
                   for oi in range(len(order))}
    for item in plan:
        if item[0] == "block":
            lines.append(block_lines[item[1]])
        else:
            lines.extend(sequential_fn(item[1], item[2]))
    return lines


def _num_genotypes(nm: np.ndarray, ploidy: int) -> np.ndarray:
    n_alt = nm - 1
    if ploidy == 2:
        return n_alt * (n_alt + 3) // 2 + 1
    return n_alt + 1


def _ragged_offsets(lengths: np.ndarray) -> np.ndarray:
    out = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths.ravel(), out=out[1:])
    return out


def _render_samples_native(sig, bs, live, gt, gq, ad, pl, mindp, dpf,
                           rec_num_merged, ploidy) -> List[str]:
    """Render sample columns for records `bs` (all sharing FORMAT `sig`)."""
    have_gq, have_ad, have_pl, have_mindp, have_dp = sig
    mask = live[bs] >= 0                      # [R, S]
    R, S = mask.shape
    columns = []
    # GT: live -> './.' (ploidy '.'s), dead -> '.'
    gt_len = np.where(mask, ploidy, 0)
    gt_vals = np.full(int(gt_len.sum()), INT_MISSING, dtype=np.int32)
    columns.append(native_loader.render_int_lists(
        gt_vals, _ragged_offsets(gt_len), b"/"))

    def scalar_col(arr):
        vals = np.where(mask, arr[bs], INT_MISSING).astype(np.int32)
        lens = np.ones((R, S), dtype=np.int64)
        return native_loader.render_int_lists(
            vals.ravel(), _ragged_offsets(lens), b",")

    if have_gq:
        columns.append(scalar_col(gq))
    if have_ad:
        nm = rec_num_merged[bs]
        valid = mask & (ad[bs, :, 0] != INT_MISSING)
        sel = (np.arange(ad.shape[2]) < nm[:, None, None]) & valid[:, :, None]
        columns.append(native_loader.render_int_lists(
            ad[bs][sel].astype(np.int32),
            _ragged_offsets(np.where(valid, nm[:, None], 0)), b","))
    if have_pl:
        ng = _num_genotypes(rec_num_merged[bs], ploidy)
        valid = mask & (pl[bs, :, 0] != INT_MISSING)
        sel = (np.arange(pl.shape[2]) < ng[:, None, None]) & valid[:, :, None]
        columns.append(native_loader.render_int_lists(
            pl[bs][sel].astype(np.int32),
            _ragged_offsets(np.where(valid, ng[:, None], 0)), b","))
    if have_mindp:
        columns.append(scalar_col(mindp))
    if have_dp:
        columns.append(scalar_col(dpf))
    entries, entry_offs = native_loader.join_columns(columns, b":")
    recs, rec_offs = native_loader.join_rows(entries, entry_offs, S, b"\t")
    return [recs[rec_offs[r]:rec_offs[r + 1]].decode("ascii")
            for r in range(R)]


def _render_samples_py(sig, live_b, gt_b, gq_b, ad_b, pl_b, mindp_b,
                       dpf_b, nm, ploidy) -> str:
    """Pure-Python fallback, field-for-field identical to the native path."""
    have_gq, have_ad, have_pl, have_mindp, have_dp = sig
    n_fields = 1 + sum(sig)
    n_gt_w = int(_num_genotypes(np.asarray(nm), ploidy))
    out = []
    for s in range(len(live_b)):
        if live_b[s] < 0:
            out.append(":".join("." for _ in range(n_fields)))
            continue
        parts = ["/".join("." for _ in range(len(gt_b[s])))]
        if have_gq:
            parts.append(str(int(gq_b[s]))
                         if gq_b[s] != INT_MISSING else ".")
        if have_ad:
            vals = ad_b[s, :nm]
            parts.append(",".join(
                "." if v == INT_MISSING else str(int(v))
                for v in vals) if vals[0] != INT_MISSING else ".")
        if have_pl:
            vals = pl_b[s, :n_gt_w]
            parts.append(",".join(
                "." if v == INT_MISSING else str(int(v))
                for v in vals) if vals[0] != INT_MISSING else ".")
        if have_mindp:
            parts.append(str(int(mindp_b[s]))
                         if mindp_b[s] != INT_MISSING else ".")
        if have_dp:
            parts.append(str(int(dpf_b[s]))
                         if dpf_b[s] != INT_MISSING else ".")
        out.append(":".join(parts))
    return "\t".join(out)
