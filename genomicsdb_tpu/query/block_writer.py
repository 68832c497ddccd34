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
from ..store.columnar import ColumnarStore
from ..vcf.fasta import ReferenceGenome

INT_MISSING = formats.INT_MISSING
LEGAL = {"A", "T", "G", "C"}

# default INFO median field order matches store_to_block's default
INFO_FIELD_VCF_ORDER = ["BaseQRankSum", "ClippingRankSum", "MQRankSum",
                        "ReadPosRankSum", "MQ", "MQ0"]


def render_block_vcf(store: ColumnarStore, qc: QueryConfig,
                     vid: VidMapper,
                     interval,
                     ref_genome: Optional[ReferenceGenome] = None,
                     max_merged: int = 4, ploidy: int = 2) -> List[str]:
    """Combined records for `interval` via the device pipeline."""
    blk, meta = store_to_block(store, qc, interval=interval,
                               max_merged=max_merged, ploidy=ploidy,
                               return_meta=True)
    out = combine_step(*block_to_args(blk), max_merged=max_merged,
                       ploidy=ploidy)
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
    starts = blk.starts
    for b in range(B):
        if not np.any(live[b] >= 0):
            continue
        start = int(starts[b])
        rec_end = int(meta.ends[b])
        loc = vid.get_contig_location(start)
        contig, cpos = loc
        ref = meta.refs[b]
        if ref is None or (len(ref) == 1 and ref == "N"):
            base = ref_genome.base_at(contig, cpos) if ref_genome else "N"
            ref = base if base in LEGAL else "N"
        alts = meta.alts[b]
        alt_txt = ",".join("<NON_REF>" if a.startswith("&") else a
                           for a in alts) or "."
        nm = int(blk.rec_num_merged[b])
        n_alt = nm - 1
        n_gt = n_alt * (n_alt + 3) // 2 + 1 if ploidy == 2 else n_alt + 1
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
        have_ad = bool(np.any(ad[b, :, 0] != INT_MISSING))
        have_pl = bool(np.any(pl[b, :, 0] != INT_MISSING))
        have_gq = bool(np.any(gq[b] != INT_MISSING))
        have_mindp = bool(np.any(mindp[b] != INT_MISSING))
        have_dp = bool(np.any(dpf[b] != INT_MISSING))
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
        cols = [contig, str(cpos + 1), ".", ref, alt_txt, ".", ".",
                ";".join(info_parts) if info_parts else ".",
                ":".join(fmt)]
        for s in range(S):
            if live[b, s] < 0:
                cols.append(":".join("." for _ in fmt))
                continue
            parts = []
            g = gt[b, s]
            parts.append("/".join("." for _ in range(len(g))))
            if have_gq:
                parts.append(str(int(gq[b, s]))
                             if gq[b, s] != INT_MISSING else ".")
            if have_ad:
                vals = ad[b, s, :nm]
                parts.append(",".join(
                    "." if v == INT_MISSING else str(int(v))
                    for v in vals) if vals[0] != INT_MISSING else ".")
            if have_pl:
                vals = pl[b, s, :n_gt]
                parts.append(",".join(
                    "." if v == INT_MISSING else str(int(v))
                    for v in vals) if vals[0] != INT_MISSING else ".")
            if have_mindp:
                parts.append(str(int(mindp[b, s]))
                             if mindp[b, s] != INT_MISSING else ".")
            if have_dp:
                parts.append(str(int(dpf[b, s]))
                             if dpf[b, s] != INT_MISSING else ".")
            cols.append(":".join(parts))
        lines.append("\t".join(cols))
    return lines
