"""Streaming query readers.

Python equivalents of the reference's Java-facing read path:
  * GenomicsDBQueryStream / GenomicsDBBCFGenerator
    (genomicsdb_bcf_generator.h:33-93, reader/GenomicsDBQueryStream.java:38):
    incremental, byte-budgeted production of combined records backed by a
    resumable scan.
  * GenomicsDBFeatureReader (reader/GenomicsDBFeatureReader.java): iterate
    combined records as structured objects per query interval.

Our scan is a Python generator, so resumability is structural; pages are
produced on demand without materializing the whole result.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from ..core.config import QueryConfig, QueryParams
from ..core.vid import VidMapper
from ..store.columnar import ColumnarStore
from ..vcf.fasta import ReferenceGenome
from ..vcf.header import build_header_lines, chrom_line, load_template
from .scan import scan_variants
from .vcf_writer import CombineToVCF


from functools import lru_cache


@lru_cache(maxsize=8)
def _header_dict_cached(lines_key):
    from ..vcf.bcf import _HeaderDict
    return _HeaderDict(list(lines_key))


class CombinedRecordStream:
    """Iterates combined-VCF text records lazily (header + records)."""

    def __init__(self, store: ColumnarStore, qc: QueryConfig,
                 qp: QueryParams, vid: VidMapper,
                 template_path: Optional[str] = None,
                 reference_path: Optional[str] = None,
                 engine: str = "block"):
        self.store = store
        self.qc = qc
        self.qp = qp
        self.vid = vid
        self.engine = engine
        self.reference_path = reference_path
        self._template_path = template_path
        ref_genome = (ReferenceGenome(reference_path)
                      if reference_path else None)
        sample_names = [vid.callset_name(r) for r in qc.rows_to_query]
        filter_names = {info.field_idx: name
                        for name, info in vid.fields.items()}
        self.op = CombineToVCF(qc, vid, ref_genome, sample_names,
                               filter_name_by_field_idx=filter_names)
        self.header_lines: List[str] = []
        if template_path:
            template = load_template(template_path)
            self.header_lines = build_header_lines(template, vid, qc)
            self.header_lines.append(
                chrom_line(sample_names, qc.sites_only_query))

    def __iter__(self) -> Iterator[str]:
        if self.engine == "block":
            # batched device engine, lazily per record-aligned chunk —
            # byte-identical lines (tests/test_block_golden_matrix.py)
            from .driver import iter_vcf_query_block
            for line in self.header_lines:
                yield line + "\n"
            for rec in iter_vcf_query_block(
                    self.store, self.qc, self.qp, self.vid,
                    template_path=None,
                    reference_path=self.reference_path):
                yield rec + "\n"
            return
        for line in self.header_lines:
            yield line + "\n"
        intervals = self.qc.column_intervals or [None]
        for iv in intervals:
            for variant in scan_variants(self.store, self.qc, iv,
                                         handle_spanning_deletions=True):
                n_before = len(self.op.lines)
                self.op.operate(variant)
                for rec in self.op.lines[n_before:]:
                    yield rec + "\n"
                self.op.lines.clear()

    def pages(self, page_size: int) -> Iterator[bytes]:
        """Byte-budgeted pages (the '-p page_size' / JNI stream mode)."""
        page = bytearray()
        for rec in self:
            page += rec.encode()
            if len(page) >= page_size:
                yield bytes(page)
                page = bytearray()
        if page:
            yield bytes(page)

    def _record_chunks(self):
        """(blob bytes, line_offsets int64[n+1]) per record-aligned
        chunk: the block engine's coalesced multi-line chunks carried as
        single blobs — no per-line string materialization between the
        text renderer and the BCF2 encoder."""
        import numpy as np
        if self.engine == "block":
            from . import serving_index as si
            from .driver import iter_vcf_query_block

            def _bypassed():
                # bcf_stream consulted the serving index already; this
                # engine pass must not count as a second query
                with si._Bypass():
                    yield from iter_vcf_query_block(
                        self.store, self.qc, self.qp, self.vid,
                        template_path=None,
                        reference_path=self.reference_path,
                        coalesce=True)
            it = _bypassed()
        else:
            it = (ln.rstrip("\n") for ln in self
                  if not ln.startswith("#"))
        for ch in it:
            b = ch.encode()
            if not b or len(b) != len(ch):    # empty / non-ASCII
                if b:
                    yield None, ch            # caller's per-line path
                continue
            arr = np.frombuffer(b, np.uint8)
            nl_pos = np.flatnonzero(arr == 10)
            offs = np.empty(len(nl_pos) + 2, np.int64)
            offs[0] = 0
            offs[1:-1] = nl_pos + 1
            offs[-1] = len(b)
            yield b, offs

    def bcf_stream(self) -> Iterator[bytes]:
        """BCF2 byte stream: header block first, then one encoded BCF2
        record per combined record — the wire format the reference's
        GenomicsDBQueryStream serves to htsjdk
        (genomicsdb_bcf_generator.h:33-93, read_and_advance)."""
        import struct

        from ..vcf.bcf import (_encode_blob_native,
                               _encode_record,
                               _encode_records_native,
                               _synthesize_declarations)

        def _HeaderDict(lines):
            # header dicts recur across queries of one serving process
            # (the GATK split pattern: thousands of small interval
            # queries against one store) — cache by the header text
            return _header_dict_cached(tuple(lines))

        def header_block(lines):
            text = "\n".join(lines) + "\n\0"
            return (b"BCF\x02\x02" + struct.pack("<I", len(text))
                    + text.encode())

        def encode_batch(recs, hd, n_sample):
            enc = _encode_records_native(recs, hd, n_sample)
            if enc is not None:
                return enc
            return [_encode_record(r, hd, n_sample) for r in recs]

        def encode_chunks(hd):
            # whole rendered chunks flow as (blob, offsets) straight to
            # the (chunk-parallel) native encoder; per-line paths only
            # on native miss / non-ASCII
            for b, offs in self._record_chunks():
                if b is None:             # non-ASCII chunk: line path
                    lines = [ln for ln in offs.split("\n") if ln]
                    yield from encode_batch(lines, hd, n_sample)
                    continue
                enc = _encode_blob_native(b, offs, hd, n_sample)
                if enc is not None:
                    yield enc
                    continue
                lines = [ln for ln in b.decode().split("\n") if ln]
                yield from encode_batch(lines, hd, n_sample)

        n_sample = len(self.qc.rows_to_query)
        if self.header_lines:
            # full template header: declarations complete; encode in
            # record batches through the native BCF2 kernel
            hd = _HeaderDict(self.header_lines)
            served = self._serve_bcf_from_index(hd, n_sample)
            if served is not None:
                yield header_block(self.header_lines)
                yield from served
                return
            yield header_block(self.header_lines)
            yield from encode_chunks(hd)
            return
        # headerless: declare from the vid (authoritative types — no
        # per-record text scan), then synthesize only what's left
        chrom = ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                 + "\t".join(self.vid.callset_name(r)
                             for r in self.qc.rows_to_query))
        header_lines = (["##fileformat=VCFv4.1"]
                        + self._vid_declarations() + [chrom])
        hd = _HeaderDict(header_lines)
        # records come from THIS stream's renderer, whose id universe
        # is the vid (contigs, field vcf names, GT) — when all of it is
        # already declared, the O(records) synthesis scan is provably a
        # no-op and is skipped (the GATK split pattern sends thousands
        # of small interval queries; the scan was ~15% of each)
        if self._vid_ids_declared(hd):
            served = self._serve_bcf_from_index(hd, n_sample)
            if served is not None:
                yield header_block(header_lines)
                yield from served
                return
            yield header_block(header_lines)
            yield from encode_chunks(hd)
            return
        records = [ln.rstrip("\n") for ln in self
                   if not ln.startswith("#")]
        extra = _synthesize_declarations(records, hd)
        if extra:
            header_lines = header_lines[:-1] + extra + [header_lines[-1]]
            hd = _HeaderDict(header_lines)
        yield header_block(header_lines)
        yield from encode_batch(records, hd, n_sample)

    # -- materialized serving (query/serving_index.py) -------------------
    def _serve_bcf_from_index(self, hd, n_sample: int):
        """Iterator of BCF2 record bytes via the materialized serving
        index, or None (engine path)."""
        from ..core.config import INT64_MAX
        from ..store.columnar import ColumnarStore
        from . import serving_index as si
        if self.engine != "block" \
                or not isinstance(self.store, ColumnarStore):
            return None
        idx = si.lookup_for_query(self.store, self.qc, self.qp,
                                  self.vid, self._template_path,
                                  self.reference_path)
        if idx is None:
            return None
        idx.ensure_bcf(hd, n_sample)
        intervals = self.qc.column_intervals or [(0, INT64_MAX - 2)]

        def edge_fn(lo, hi):
            return si.engine_bcf_bytes(self.store, self.qc, self.qp,
                                       self.vid, self.reference_path,
                                       hd, n_sample, lo, hi)

        ref_base = si.make_ref_base(
            ReferenceGenome(self.reference_path)
            if self.reference_path else None)

        def encode_fn(lines):
            return si.encode_lines_bcf(lines, hd, n_sample)

        def gen():
            for lo, hi in intervals:
                served = idx.serve_bcf(int(lo), int(hi), edge_fn,
                                       ref_base, encode_fn)
                if served is None:
                    chunk = edge_fn(int(lo), int(hi))
                    if chunk:
                        yield chunk
                else:
                    yield from served
        return gen()

    def _vid_ids_declared(self, hd) -> bool:
        """True when every id this stream's renderers can emit is
        already declared in `hd`: all vid contigs, GT, and — per role —
        every vid field's vcf name (FILTER names can reference any vid
        field idx via filter_name_by_field_idx, so require them all in
        the string dictionary).  Conservative: any miss falls back to
        the per-record _synthesize_declarations scan."""
        if "GT" not in hd.format_type or "PASS" not in hd.str_idx:
            return False
        for c in self.vid._contigs_by_offset:
            if c.name not in hd.contig_idx:
                return False
        for name, info in self.vid.fields.items():
            vcf_name = info.vcf_name or name
            # FILTER tokens are rendered from the vid field NAME
            # (filter_name_by_field_idx maps field_idx -> name), so the
            # name must be in the string dictionary even if a future
            # vcf_field_name alias declares the field under vcf_name
            if name not in hd.str_idx or vcf_name not in hd.str_idx:
                return False
            if info.is_info and vcf_name not in hd.info_type:
                return False
            if info.is_format and vcf_name != "GT" \
                    and vcf_name not in hd.format_type:
                return False
        return True

    def _vid_declarations(self) -> List[str]:
        """##contig/##FILTER/##INFO/##FORMAT lines for every vid field
        (vid types are authoritative; unused declarations are legal and
        the string-table indices stay header-consistent)."""
        tmap = {"int": "Integer", "float": "Float", "char": "String",
                "flag": "Flag"}
        out = [f"##contig=<ID={c.name},length={c.length}>"
               for c in self.vid._contigs_by_offset]
        seen = set()
        for name, info in self.vid.fields.items():
            vcf_name = info.vcf_name or name
            if info.is_filter and vcf_name != "PASS" \
                    and (vcf_name, "F") not in seen:
                seen.add((vcf_name, "F"))
                out.append(f'##FILTER=<ID={vcf_name},Description="">')
            t = ("String" if info.vcf_type == "string"
                 else tmap.get(info.type, "String"))
            if info.is_info and (vcf_name, "i") not in seen:
                seen.add((vcf_name, "i"))
                num = "0" if t == "Flag" else "."
                out.append(f'##INFO=<ID={vcf_name},Number={num},'
                           f'Type={t},Description="">')
            if info.is_format and vcf_name != "GT" \
                    and (vcf_name, "f") not in seen:
                seen.add((vcf_name, "f"))
                out.append(f'##FORMAT=<ID={vcf_name},Number=.,'
                           f'Type={t},Description="">')
        # every remaining vid field NAME lands in the string dictionary
        # as a FILTER id: classless fields (LowQual etc.) genuinely
        # appear as FILTER tokens, and the renderer emits FILTER tokens
        # by field NAME — so _vid_ids_declared can prove the synthesis
        # scan is a no-op (unused declarations are legal)
        declared = {v for v, _ in seen} | {"GT", "PASS"}
        for name, info in self.vid.fields.items():
            if name not in declared:
                declared.add(name)
                out.append(f'##FILTER=<ID={name},Description="">')
        out.append('##FORMAT=<ID=GT,Number=1,Type=String,'
                   'Description="Genotype">')
        return out


class FeatureReader:
    """Structured-record iteration per interval (htsjdk FeatureReader
    equivalent).  Yields (contig, pos_1based, variant, operator) tuples the
    caller can inspect without text parsing."""

    def __init__(self, store: ColumnarStore, qc: QueryConfig,
                 vid: VidMapper):
        self.store = store
        self.qc = qc
        self.vid = vid

    def query(self, contig: str, begin_1based: int, end_1based: int):
        lo = self.vid.flatten_position(contig, begin_1based)
        hi = self.vid.flatten_position(contig, end_1based)
        for variant in scan_variants(self.store, self.qc, (lo, hi)):
            loc = self.vid.get_contig_location(variant.start)
            yield (loc[0], loc[1] + 1, variant)

    def iterate(self):
        for variant in scan_variants(self.store, self.qc, None):
            loc = self.vid.get_contig_location(variant.start)
            yield (loc[0], loc[1] + 1, variant)
