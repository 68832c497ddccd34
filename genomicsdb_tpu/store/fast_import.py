"""Native-accelerated columnar-direct VCF import.

The production data loader: tokenizes the VCF record section with the C++
kernels (runtime/native/vcf_kernels.cpp), parses per-sample FORMAT fields
in batched native calls, and assembles `ColumnarStore` columns directly —
no per-cell Python objects.  Per-record work (INFO parsing, ALT strings)
stays in Python; per-(record x sample) work is native.

Falls back (returns None) for vids using 2-D fields or flag INFO fields,
or when the native library is unavailable; callers then use the reference
Python path (import_pipeline.VCFCellConverter).  Equality with the Python
path is asserted in tests/test_fast_import.py.
"""

from __future__ import annotations

import gzip
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core import formats
from ..core import known_fields as kf
from ..core.vid import VidMapper
from ..runtime import native_loader as nl
from .columnar import ColumnarStore, FieldData
from .import_pipeline import (NON_REF_REPR, _is_sum_like,
                              field_specs_for_vid, is_symbolic_allele)

INT_MISSING = formats.INT_MISSING


def _supported(vid: VidMapper, nsamples: int) -> bool:
    for name in vid.field_order:
        info = vid.fields[name]
        if not (info.is_info or info.is_format):
            continue
        if info.length.num_dimensions > 1 or info.is_composite():
            return False
    return True


def fast_import_file(path: str, vid: VidMapper,
                     idx_to_row: Dict[int, int],
                     treat_deletions_as_intervals: bool = True
                     ) -> Optional[ColumnarStore]:
    if nl.get_lib() is None:
        return None
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    # split header / records
    hdr_end = data.rfind(b"#CHROM")
    if hdr_end < 0:
        return None
    nl_idx = data.find(b"\n", hdr_end)
    chrom_line = data[hdr_end:nl_idx].decode()
    samples = chrom_line.rstrip("\n").split("\t")[9:]
    if not _supported(vid, len(samples)):
        return None
    records = data[nl_idx + 1:]
    toks = nl.tokenize_records(records, max_cols=10 + len(samples))
    if toks is None:
        return None
    offs, ncols = toks
    n = len(offs)
    if n == 0:
        return None
    mapped = [(k, idx_to_row[k]) for k in sorted(idx_to_row)
              if k < len(samples)]
    K_s = len(mapped)
    n_cells = n * K_s

    # ---- coordinates ----
    pos, _ = nl.parse_int_lists(records, offs[:, 1].copy(),
                                (offs[:, 2] - 1).copy())
    # contig offsets: resolve per run of identical CHROM spans
    chrom_off = np.empty(n, dtype=np.int64)
    prev = None
    prev_off = 0
    for i in range(n):
        span = bytes(records[offs[i, 0]:offs[i, 1] - 1])
        if span != prev:
            prev = span
            prev_off = vid.contigs[span.decode()].offset
        chrom_off[i] = prev_off
    col = chrom_off + pos - 1

    # ---- REF / ALT / ID / QUAL / FILTER (per record) ----
    refs = [records[offs[i, 3]:offs[i, 4] - 1].decode() for i in range(n)]
    alts_raw = [records[offs[i, 4]:offs[i, 5] - 1].decode()
                for i in range(n)]
    alt_strs = []
    alt_lists = []
    for a in alts_raw:
        parts = [] if a == "." else a.split(",")
        parts = [NON_REF_REPR if p == "<NON_REF>" else p for p in parts]
        alt_lists.append(parts)
        alt_strs.append("|".join(parts))
    quals, _ = nl.parse_float_lists(records, offs[:, 5].copy(),
                                    (offs[:, 6] - 1).copy())
    import_id = "ID" in vid.fields
    ids = [records[offs[i, 2]:offs[i, 3] - 1].decode() for i in range(n)] \
        if import_id else None
    filter_ids: List[List[int]] = []
    fcache: Dict[bytes, List[int]] = {}
    for i in range(n):
        span = bytes(records[offs[i, 6]:offs[i, 7] - 1])
        got = fcache.get(span)
        if got is None:
            txt = span.decode()
            got = ([] if txt == "." else
                   [vid.fields[f].field_idx for f in txt.split(";")
                    if f in vid.fields])
            fcache[span] = got
        filter_ids.append(got)

    # ---- END column (INFO END= or deletion length) ----
    end = col.copy()
    info_spans = [(offs[i, 7], offs[i, 8] - 1) for i in range(n)]
    info_strs = [records[a:b].decode() for a, b in info_spans]
    info_dicts: List[Dict[str, Optional[str]]] = []
    for i, s in enumerate(info_strs):
        d: Dict[str, Optional[str]] = {}
        if s != ".":
            for item in s.split(";"):
                if "=" in item:
                    k_, v_ = item.split("=", 1)
                    d[k_] = v_
                elif item:
                    d[item] = None
        info_dicts.append(d)
        if "END" in d:
            end[i] = chrom_off[i] + int(d["END"]) - 1
        elif treat_deletions_as_intervals:
            rl = len(refs[i])
            for alt in alt_lists[i]:
                if (not is_symbolic_allele(alt) and len(alt) != rl
                        and rl > len(alt)):
                    end[i] = col[i] + rl - 1
                    break

    # ---- build cell coordinate arrays (record-major x mapped sample) ----
    store = ColumnarStore(num_rows=vid.max_callset_row_idx() + 1)
    rows_per_rec = np.array([r for _, r in mapped], dtype=np.int64)
    cell_row = np.repeat(rows_per_rec[None, :], n, axis=0).ravel()
    cell_col = np.repeat(col, K_s)
    cell_end = np.repeat(end, K_s)

    specs = field_specs_for_vid(vid, import_id)
    attrs = [a for a in vid.schema_attribute_names(import_id)
             if a != "END"]
    fields: Dict[str, FieldData] = {}

    def ragged_from_per_record(values_list, dtype, as_str=False):
        """Per-record python values -> per-cell ragged (replicated to all
        mapped samples); vectorized over the sample axis."""
        np_dtype = np.uint8 if as_str else dtype
        rec_arrays = []
        rec_lens = np.zeros(n, dtype=np.int64)
        for i, v in enumerate(values_list):
            if v is None:
                continue
            arr = (np.frombuffer(v.encode(), dtype=np.uint8) if as_str
                   else np.asarray(v, dtype=dtype))
            rec_arrays.append(arr)
            rec_lens[i] = len(arr)
        lens = np.repeat(rec_lens, K_s)
        offsets = np.zeros(n_cells + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        if rec_arrays:
            rec_values = np.concatenate(rec_arrays)
            rec_offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(rec_lens, out=rec_offsets[1:])
            # each record's payload repeated K_s times, in cell order
            sel = rec_lens > 0
            src0 = np.repeat(rec_offsets[:-1][sel], K_s)
            sl = np.repeat(rec_lens[sel], K_s)
            cell_ids = (np.repeat(np.nonzero(sel)[0], K_s) * K_s
                        + np.tile(np.arange(K_s), int(sel.sum())))
            dest0 = offsets[:-1][cell_ids]
            src_idx = _ragged_arange(src0, sl)
            dest_idx = _ragged_arange(dest0, sl)
            values = np.empty(int(offsets[-1]), dtype=np_dtype)
            values[dest_idx] = rec_values[src_idx]
        else:
            values = np.zeros(0, dtype=np_dtype)
        valid = np.repeat(
            np.array([v is not None for v in values_list]), K_s)
        return valid, values, offsets

    # REF/ALT/ID strings
    v, vals, off = ragged_from_per_record(refs, None, as_str=True)
    fields["REF"] = FieldData("REF", "str", "bytes", v, vals, off)
    v, vals, off = ragged_from_per_record(alt_strs, None, as_str=True)
    fields["ALT"] = FieldData("ALT", "str", "bytes", v, vals, off)
    if import_id:
        idv = [x if x and x != "." else None for x in ids]
        v, vals, off = ragged_from_per_record(idv, None, as_str=True)
        fields["ID"] = FieldData("ID", "str", "bytes", v, vals, off)
    # QUAL fixed float
    qvals = np.repeat(quals, K_s).reshape(n_cells, 1).astype(np.float32)
    qvalid = np.repeat(
        quals.view(np.uint32) != formats.FLOAT_MISSING_BITS, K_s)
    fields["QUAL"] = FieldData("QUAL", "fixed", "float32", qvalid, qvals)
    # FILTER ragged int
    v, vals, off = ragged_from_per_record(
        [fi for fi in filter_ids], np.int32)
    fields["FILTER"] = FieldData("FILTER", "ragged", "int32", v,
                                 vals.astype(np.int32), off)

    # ---- INFO fields (per record, replicated) ----
    for name in attrs:
        info = vid.fields.get(name)
        if info is None or not info.is_info or name in fields:
            continue
        vcfn = info.vcf_name
        is_float = info.type == "float"
        per_rec: List[Optional[np.ndarray]] = []
        if info.type == "flag":
            per_rec = [np.asarray([1], dtype=np.int32) if vcfn in d
                       else None for d in info_dicts]
            kind, dtype, flen = specs[name]
            valid = np.repeat(np.array([x is not None for x in per_rec]),
                              K_s)
            mat = np.full((n, flen), INT_MISSING, dtype=np.int32)
            for i, x in enumerate(per_rec):
                if x is not None:
                    mat[i, 0] = 1
            fields[name] = FieldData(name, "fixed", dtype, valid,
                                     np.repeat(mat, K_s, axis=0))
            continue
        for d in info_dicts:
            raw = d.get(vcfn)
            if raw is None:
                per_rec.append(None)
                continue
            toks2 = raw.split(",")
            if is_float:
                arr = np.asarray(
                    [np.float32(t) if t not in (".", "")
                     else formats.FLOAT_MISSING for t in toks2],
                    dtype=np.float32)
                allmiss = np.all(arr.view(np.uint32)
                                 == formats.FLOAT_MISSING_BITS)
            else:
                arr = np.asarray(
                    [int(t) if t not in (".", "") else INT_MISSING
                     for t in toks2], dtype=np.int32)
                allmiss = len(arr) == 1 and arr[0] == INT_MISSING
            per_rec.append(None if allmiss else arr)
        kind, dtype, flen = specs[name]
        divide = (_is_sum_like(info.combine_op) and len(samples) > 1)
        if kind == "fixed":
            valid = np.repeat(np.array([x is not None for x in per_rec]),
                              K_s)
            fill = formats.FLOAT_MISSING if is_float else INT_MISSING
            mat = np.full((n, flen),
                          fill,
                          dtype=np.float32 if is_float else np.int32)
            for i, x in enumerate(per_rec):
                if x is not None:
                    mat[i, :len(x)] = x[:flen]
            out = np.repeat(mat, K_s, axis=0)
            if divide:
                out = _divide_cells(out, valid, mapped, len(samples), K_s,
                                    is_float)
            fields[name] = FieldData(name, "fixed", dtype, valid, out)
        else:
            v, vals, off = ragged_from_per_record(
                per_rec, np.float32 if is_float else np.int32)
            if divide and len(vals):
                vals = _divide_ragged(vals, off, v, mapped, len(samples),
                                      K_s, is_float)
            fields[name] = FieldData(name, kind, dtype, v, vals, off)

    # ---- FORMAT fields (native, per sample) ----
    fmt_spans = np.zeros((n, 2), dtype=np.int64)
    has_fmt = ncols > 8
    fmt_keys: List[Tuple[str, ...]] = []
    kcache: Dict[bytes, Tuple[str, ...]] = {}
    for i in range(n):
        if ncols[i] > 8:
            span = bytes(records[offs[i, 8]:offs[i, 9] - 1])
            keys = kcache.get(span)
            if keys is None:
                keys = tuple(span.decode().split(":"))
                kcache[span] = keys
            fmt_keys.append(keys)
        else:
            fmt_keys.append(())
    _ = (fmt_spans, has_fmt)
    fmt_names = [a for a in attrs
                 if vid.fields.get(a) is not None
                 and vid.fields[a].is_format]
    # group records by FORMAT signature
    groups: Dict[Tuple[str, ...], np.ndarray] = {}
    sig_arr = np.array([hash(k) for k in fmt_keys])
    for sig in set(fmt_keys):
        groups[sig] = np.nonzero(
            np.array([k == sig for k in fmt_keys]))[0]
    _ = sig_arr
    # Parse jobs: one per (FORMAT signature, mapped sample).  Each job
    # scans its sample column ONCE for every requested field
    # (gdb_split_fields_multi) and parses natively; ctypes releases the
    # GIL, so jobs run in parallel across host cores.
    field_meta = {}
    for name in fmt_names:
        info = vid.fields[name]
        field_meta[name] = (info, info.vcf_name == "GT",
                            info.type == "float",
                            info.type in ("char", "string"))
    lens_by_field = {name: np.zeros(n_cells, dtype=np.int64)
                     for name in fmt_names}
    chunks_by_field: Dict[str, List[Tuple[np.ndarray, np.ndarray,
                                          np.ndarray, np.ndarray]]] = \
        {name: [] for name in fmt_names}
    per_cell_by_field: Dict[str, Optional[List[Optional[np.ndarray]]]] = {
        name: ([None] * n_cells if field_meta[name][3] else None)
        for name in fmt_names}

    def parse_sample(recs, present, fidxs, k_pos, local_idx):
        scol = 9 + local_idx
        s_starts = offs[recs, scol].copy()
        s_ends = (offs[recs, scol + 1] - 1).copy()
        fs_all, fe_all = nl.split_fields_multi(records, s_starts, s_ends,
                                               b":", fidxs)
        out = []
        for (name, (info, is_gt, is_float, is_char)), fs, fe in zip(
                present, fs_all, fe_all):
            if is_char:
                # strings: python per record (rare fields)
                items = []
                for j, ri in enumerate(recs):
                    s = records[fs[j]:fe[j]].decode()
                    if s and s != ".":
                        items.append((int(ri), np.frombuffer(
                            s.encode(), dtype=np.uint8)))
                out.append((name, "char", k_pos, items))
                continue
            if is_gt:
                vals2, off2 = nl.parse_gt(
                    records, fs, fe, info.length.contains_phase())
            elif is_float:
                vals2, off2 = nl.parse_float_lists(records, fs, fe)
            else:
                vals2, off2 = nl.parse_int_lists(records, fs, fe)
            seg_lens = np.diff(off2)
            # all-missing segments are invalid
            # (variant_field_data.h:360-384)
            if not is_gt and len(vals2):
                if is_float:
                    miss_elem = (vals2.view(np.uint32)
                                 == formats.FLOAT_MISSING_BITS)
                else:
                    miss_elem = vals2 == INT_MISSING
                any_valid = np.logical_or.reduceat(
                    ~miss_elem, np.minimum(off2[:-1],
                                           max(len(vals2) - 1, 0)))
                any_valid = any_valid & (seg_lens > 0)
                seg_lens = np.where(any_valid, seg_lens, 0)
            out.append((name, "num", recs * K_s + k_pos, seg_lens, vals2,
                        off2[:-1]))
        return out

    jobs = []
    for sig, recs in groups.items():
        present = []
        for name in fmt_names:
            vcfn = vid.fields[name].vcf_name
            if vcfn in sig:
                present.append(((name, field_meta[name]), sig.index(vcfn)))
        if not present:
            continue
        present.sort(key=lambda t: t[1])
        fidxs = np.asarray([fi for _, fi in present], dtype=np.int32)
        pres = [p for p, _ in present]
        for k_pos, (local_idx, _row) in enumerate(mapped):
            jobs.append((recs, pres, fidxs, k_pos, local_idx))

    if len(jobs) >= 4 and n_cells >= 4096:
        import concurrent.futures as cf
        import os as _os
        workers = min(8, _os.cpu_count() or 1, len(jobs))
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            job_results = list(ex.map(lambda a: parse_sample(*a), jobs))
    else:
        job_results = [parse_sample(*a) for a in jobs]

    for items in job_results:
        for it in items:
            if it[1] == "char":
                name, _, k_pos, cell_items = it
                pcv = per_cell_by_field[name]
                lens = lens_by_field[name]
                for ri, arr in cell_items:
                    cid = ri * K_s + k_pos
                    pcv[cid] = arr
                    lens[cid] = len(arr)
            else:
                name, _, cids, seg_lens, vals2, src_off = it
                lens_by_field[name][cids] = seg_lens
                chunks_by_field[name].append((cids, seg_lens, vals2,
                                              src_off))

    for name in fmt_names:
        info, is_gt, is_float, is_char = field_meta[name]
        kind, dtype, flen = specs[name]
        lens = lens_by_field[name]
        chunks = chunks_by_field[name]
        per_cell_vals = per_cell_by_field[name]
        valid = lens > 0
        if kind == "fixed":
            fill = formats.FLOAT_MISSING if is_float else INT_MISSING
            mat = np.full((n_cells, flen), fill,
                          dtype=np.float32 if is_float else np.int32)
            for cids, seg_lens, vals2, src_off in chunks:
                for e in range(flen):
                    sel = seg_lens > e
                    mat[cids[sel], e] = vals2[src_off[sel] + e]
            fields[name] = FieldData(name, "fixed", dtype, valid, mat)
        else:
            offsets = np.zeros(n_cells + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            if is_char:
                empty = np.zeros(0, dtype=np.uint8)
                nz = [per_cell_vals[c] for c in np.nonzero(valid)[0]]
                values = np.concatenate(nz) if nz else empty
            else:
                np_dtype = np.float32 if is_float else np.int32
                values = np.empty(int(offsets[-1]), dtype=np_dtype)
                for cids, seg_lens, vals2, src_off in chunks:
                    sel = seg_lens > 0
                    if not np.any(sel):
                        continue
                    sl = seg_lens[sel]
                    # vectorized segment copy: dest/src element indices
                    dest0 = offsets[cids[sel]]
                    src0 = src_off[sel]
                    reps = np.repeat(dest0 - src0, sl)
                    src_idx = _ragged_arange(src0, sl)
                    values[src_idx + reps] = vals2[src_idx]
            fields[name] = FieldData(name, kind, dtype, valid, values,
                                     offsets)

    store.attribute_order = attrs
    store.row = cell_row
    store.col = cell_col
    store.end = cell_end
    store.eff_end = cell_end.copy()  # recomputed by merge/sort below
    store.fields = fields
    return store


def _divide_cells(out, valid, mapped, nsamples, K_s, is_float):
    """divide_up_among_samples (vcf2binary.h:35-53) on replicated per-cell
    fixed-field matrices [n_cells, flen]."""
    out = out.copy()
    for k_pos, (local_idx, _row) in enumerate(mapped):
        rows = np.arange(k_pos, len(out), K_s)
        block = out[rows]
        if is_float:
            miss = block.view(np.uint32) == formats.FLOAT_MISSING_BITS
            with np.errstate(invalid="ignore"):
                d = (block / np.float32(nsamples)).astype(np.float32)
            d[miss] = block[miss]
        else:
            miss = block == INT_MISSING
            d = block // nsamples + (local_idx < (block % nsamples))
            d = d.astype(np.int32)
            d[miss] = block[miss]
        out[rows] = d
    return out


def _divide_ragged(vals, off, valid, mapped, nsamples, K_s, is_float):
    vals = vals.copy()
    for k_pos, (local_idx, _row) in enumerate(mapped):
        for cid in range(k_pos, len(off) - 1, K_s):
            lo, hi = off[cid], off[cid + 1]
            if hi <= lo:
                continue
            seg = vals[lo:hi]
            if is_float:
                miss = seg.view(np.uint32) == formats.FLOAT_MISSING_BITS
                with np.errstate(invalid="ignore"):
                    d = (seg / np.float32(nsamples)).astype(np.float32)
                d[miss] = seg[miss]
            else:
                miss = seg == INT_MISSING
                d = (seg // nsamples
                     + (local_idx < (seg % nsamples))).astype(np.int32)
                d[miss] = seg[miss]
            vals[lo:hi] = d
    return vals


def _ragged_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [s, s+1, .., s+l-1] ranges, fully vectorized."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    idx = np.arange(total, dtype=np.int64)
    seg = np.searchsorted(ends, idx, side="right")
    within = idx - (ends - lens)[seg]
    return starts[seg] + within
