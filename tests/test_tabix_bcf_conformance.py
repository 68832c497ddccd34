"""Output-edge conformance: tabix (.tbi) index emission + from-spec
random-access reads, and bit-level BCF2.2 checks written from the
htslib vcf.h / tabix specifications (NOT from the encoder — the round-1
BCF tests only self-round-tripped)."""

import gzip
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from golden_utils import (REF_TESTS, VCF_ATTRIBUTES_ORDER, load_setup,
                          make_query_params)

from genomicsdb_tpu.query import driver
from genomicsdb_tpu.vcf import bcf
import pytest

from genomicsdb_tpu.vcf.tabix import (IndexedVCFWriter, TabixReader,
                                      reg2bin, reg2bin_csi, reg2bins,
                                      reg2bins_csi)


def _combined_vcf():
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    return driver.run_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS,
                                    "inputs/chr1_10MB.fasta.gz"))


class TestTabix:
    def test_binning_matches_spec(self):
        # values computed by hand from the tabix paper's reg2bin
        assert reg2bin(0, 1) == 4681
        assert reg2bin(0, 1 << 14) == 4681
        assert reg2bin(0, (1 << 14) + 1) == 585
        assert reg2bin(1 << 14, (1 << 14) + 5) == 4682
        assert reg2bin(0, 1 << 29) == 0
        assert 4681 in reg2bins(0, 100)
        assert 0 in reg2bins(0, 100)

    def test_index_emission_and_query(self, tmp_path):
        text = _combined_vcf()
        p = str(tmp_path / "out.vcf.gz")
        with IndexedVCFWriter(p) as w:
            # awkward chunk boundaries
            for i in range(0, len(text), 997):
                w.write(text[i:i + 997])
        assert os.path.exists(p + ".tbi")
        # .tbi is valid BGZF (gzip-decompressible) with the TBI magic
        raw = gzip.decompress(open(p + ".tbi", "rb").read())
        assert raw[:4] == b"TBI\x01"
        n_ref, fmt = struct.unpack_from("<2i", raw, 4)
        assert fmt == 2 and n_ref >= 1
        # whole file round-trips through gzip
        body = gzip.decompress(open(p, "rb").read()).decode()
        assert body == text
        # region queries through the index match a linear scan
        rdr = TabixReader(p)
        records = [ln for ln in text.splitlines()
                   if ln and not ln.startswith("#")]

        def scan(contig, b1, e1):
            out = []
            for ln in records:
                cols = ln.split("\t", 8)
                if cols[0] != contig:
                    continue
                pos = int(cols[1])
                end = pos + len(cols[3]) - 1
                for kv in cols[7].split(";"):
                    if kv.startswith("END="):
                        end = int(kv[4:])
                out.append((pos, end, ln))
            return [ln for pos, end, ln in out
                    if pos <= e1 and end >= b1]

        for (b1, e1) in [(1, 10_000_000), (12141, 12141),
                         (17385, 17385), (12100, 12300),
                         (1, 100), (8029500, 8029510)]:
            got = rdr.query("1", b1, e1)
            want = scan("1", b1, e1)
            assert got == want, (b1, e1)

    def test_csi_binning_matches_tbi_at_14_5(self):
        # CSI(14, 5) is exactly the TBI scheme (htslib hts.c)
        for beg, end in [(0, 1), (0, 1 << 14), (0, (1 << 14) + 1),
                         (1 << 14, (1 << 14) + 5), (0, 1 << 29),
                         (12140, 12141), (8029500, 8029511)]:
            assert reg2bin_csi(beg, end, 14, 5) == reg2bin(beg, end)
            assert reg2bins_csi(beg, end, 14, 5) == reg2bins(beg, end)

    def test_csi_emission_and_query(self, tmp_path):
        text = _combined_vcf()
        p = str(tmp_path / "out.vcf.gz")
        with IndexedVCFWriter(p, index_format="csi") as w:
            for i in range(0, len(text), 1013):
                w.write(text[i:i + 1013])
        assert os.path.exists(p + ".csi")
        assert not os.path.exists(p + ".tbi")
        raw = gzip.decompress(open(p + ".csi", "rb").read())
        assert raw[:4] == b"CSI\x01"
        min_shift, depth = struct.unpack_from("<2i", raw, 4)
        assert (min_shift, depth) == (14, 5)
        tbi = str(tmp_path / "ref.vcf.gz")
        with IndexedVCFWriter(tbi) as w:
            w.write(text)
        r_csi, r_tbi = TabixReader(p), TabixReader(tbi)
        for (b1, e1) in [(1, 10_000_000), (12141, 12141),
                         (17385, 17385), (12100, 12300), (1, 100),
                         (8029500, 8029510)]:
            assert r_csi.query("1", b1, e1) == r_tbi.query("1", b1, e1)

    def test_auto_upgrades_past_tbi_cap(self, tmp_path):
        # a coordinate >= 2^29 forces CSI (htslib refuses .tbi there)
        lines = ["##fileformat=VCFv4.1",
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
        positions = [1000, (1 << 29) - 100, (1 << 29) + 5000,
                     (1 << 30) + 12345]
        for pos in positions:
            lines.append(f"1\t{pos}\t.\tA\tT\t.\t.\tEND={pos + 10}")
        text = "\n".join(lines) + "\n"
        p = str(tmp_path / "deep.vcf.gz")
        with IndexedVCFWriter(p) as w:
            w.write(text)
        assert os.path.exists(p + ".csi")
        rdr = TabixReader(p)
        assert rdr.depth > 5 or (1 << (rdr.min_shift + 3 * rdr.depth)) \
            > (1 << 30) + 12355
        for pos in positions:
            got = rdr.query("1", pos, pos)
            assert len(got) == 1 and got[0].startswith(f"1\t{pos}\t")
        assert len(rdr.query("1", 1, 1 << 31)) == len(positions)
        # forced tbi must refuse, like htslib
        with pytest.raises(ValueError):
            with IndexedVCFWriter(str(tmp_path / "x.vcf.gz"),
                                  index_format="tbi") as w:
                w.write(text)

    def test_multiblock_offsets(self, tmp_path):
        # >64KB of records: virtual offsets must cross BGZF blocks
        lines = ["##fileformat=VCFv4.1",
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
        for i in range(3000):
            lines.append(f"1\t{i * 50 + 1}\t.\tA\tT\t.\t.\t"
                         f"END={i * 50 + 40};X={'y' * 40}")
        text = "\n".join(lines) + "\n"
        p = str(tmp_path / "big.vcf.gz")
        with IndexedVCFWriter(p) as w:
            w.write(text)
        rdr = TabixReader(p)
        got = rdr.query("1", 100_001, 100_001)
        assert len(got) == 1 and got[0].startswith("1\t100001\t")
        got = rdr.query("1", 1, 150_000)
        assert len(got) == 3000


class TestBCFSpecBits:
    """Bit-level assertions from the BCF2.2 spec (htslib vcf.h/vcf.c),
    independent of the encoder implementation."""

    def test_typed_descriptor_layout(self):
        # 3 int8 values: descriptor byte = (3 << 4) | 1
        blob = bcf._typed_int_vec([1, 2, 3])
        assert blob[0] == (3 << 4) | 1
        assert blob[1:] == b"\x01\x02\x03"

    def test_missing_and_eov_sentinels(self):
        INT32_MISSING = -(2**31)
        INT32_EOV = -(2**31) + 1
        blob = bcf._typed_int_vec([5, INT32_MISSING, INT32_EOV])
        # int8 width: missing = 0x80, EOV = 0x81 (vcf.h bcf_int8_missing)
        assert blob[0] == (3 << 4) | 1
        assert blob[1:] == b"\x05\x80\x81"

    def test_int16_widths(self):
        blob = bcf._typed_int_vec([300])
        assert blob[0] == (1 << 4) | 2
        assert struct.unpack("<h", blob[1:])[0] == 300
        # htslib picks int16 down to -32760, int32 below
        blob = bcf._typed_int_vec([-32760])
        assert blob[0] & 0xF == 2
        blob = bcf._typed_int_vec([-32761])
        assert blob[0] & 0xF == 3

    def test_long_vector_descriptor(self):
        vals = list(range(20))
        blob = bcf._typed_int_vec(vals)
        # n >= 15: descriptor 0xF<<4 | type, then typed int count
        assert blob[0] == (15 << 4) | 1
        assert blob[1] == (1 << 4) | 1      # count as 1 int8
        assert blob[2] == 20

    def test_float_missing_bits(self):
        blob = bcf._typed_float_vec([bcf.FLOAT_MISSING_BITS])
        assert blob[0] == (1 << 4) | 5
        assert struct.unpack("<I", blob[1:])[0] == 0x7F800001

    def test_gt_encoding(self):
        # htslib: (allele+1)<<1 | phased ; '.' -> 0
        assert bcf._encode_gt_tok("0/1") == [2, 4]
        assert bcf._encode_gt_tok("0|1") == [2, 5]
        assert bcf._encode_gt_tok("./.") == [0, 0]
        assert bcf._encode_gt_tok(".") == [0]
        assert bcf._encode_gt_tok("2") == [6]

    def test_record_shared_block_layout(self):
        text = ("##fileformat=VCFv4.1\n"
                "##contig=<ID=7,length=100>\n"
                '##INFO=<ID=DP,Number=1,Type=Integer,Description="">\n'
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                "7\t13\trs1\tAC\tA\t29.5\t.\tDP=7\n")
        body = bcf.text_to_bcf(text)
        assert body[:5] == b"BCF\x02\x02"
        (l_hdr,) = struct.unpack_from("<I", body, 5)
        o = 9 + l_hdr
        l_shared, l_indiv = struct.unpack_from("<II", body, o)
        o += 8
        rec = body[o:o + l_shared]
        chrom, pos, rlen = struct.unpack_from("<3i", rec, 0)
        assert chrom == 0 and pos == 12 and rlen == 2
        (qbits,) = struct.unpack_from("<I", rec, 12)
        assert abs(np.uint32(qbits).view(np.float32) - 29.5) < 1e-6
        (n_allele_info,) = struct.unpack_from("<I", rec, 16)
        assert n_allele_info >> 16 == 2      # n_allele
        assert n_allele_info & 0xFFFF == 1   # n_info
        # ID follows as typed string "rs1"
        assert rec[24] == (3 << 4) | 7
        assert rec[25:28] == b"rs1"
        assert l_indiv == 0


class TestBCFIndex:
    """CSI indexing of BCF output (the reference's VCFAdapter produces
    an index alongside compressed output, vcf_adapter.h:89-133; htslib
    bcf_index_build writes .csi with empty aux and header-ordered
    rids)."""

    def _write_indexed_bcf(self, tmp_path):
        from genomicsdb_tpu.vcf.bgzf import open_output
        lines = ["##fileformat=VCFv4.1",
                 "##contig=<ID=1,length=249250621>",
                 "##contig=<ID=2,length=243199373>",
                 '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
                 '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\tS0"]
        recs = []
        for contig in ("1", "2"):
            pos = 100
            for i in range(400):
                end = pos + 37
                recs.append((contig, pos, end))
                lines.append(f"{contig}\t{pos}\t.\tA\t<NON_REF>\t.\t.\t"
                             f"END={end}\tGT\t0/0")
                pos = end + 13
        p = str(tmp_path / "out.bcf")
        with open_output(p, "b", index=True) as w:
            w.write("\n".join(lines) + "\n")
        return p, recs

    @staticmethod
    def _scan_records(path, voff_beg, voff_end):
        """Decode (rid, pos0, rlen) of BCF records in a chunk range."""
        from genomicsdb_tpu.vcf.tabix import _bgzf_block_at
        out = []
        with open(path, "rb") as f:
            coff, uoff = voff_beg >> 16, voff_beg & 0xFFFF
            data = bytearray()
            while True:
                payload, csize = _bgzf_block_at(f, coff)
                if not payload and csize == 0:
                    break
                lo = uoff if coff == voff_beg >> 16 else 0
                hi = (voff_end & 0xFFFF) if coff == (voff_end >> 16) \
                    else len(payload)
                data += payload[lo:hi]
                if coff >= voff_end >> 16:
                    break
                coff += csize
        o = 0
        while o + 8 <= len(data):
            l_shared, l_indiv = struct.unpack_from("<II", data, o)
            if o + 8 + l_shared + l_indiv > len(data):
                break
            rid, pos0, rlen = struct.unpack_from("<3i", data, o + 8)
            out.append((rid, pos0, rlen))
            o += 8 + l_shared + l_indiv
        return out

    def test_bcf_csi_structure_and_query(self, tmp_path):
        import numpy as np
        from genomicsdb_tpu.vcf.tabix import reg2bins_csi
        p, recs = self._write_indexed_bcf(tmp_path)
        assert os.path.exists(p + ".csi")
        raw = gzip.decompress(open(p + ".csi", "rb").read())
        assert raw[:4] == b"CSI\x01"
        min_shift, depth, l_aux = struct.unpack_from("<3i", raw, 4)
        assert (min_shift, l_aux) == (14, 0)    # htslib bcf form
        (n_ref,) = struct.unpack_from("<i", raw, 16 + l_aux)
        assert n_ref == 2                        # header contig count
        # parse bins per rid
        o = 20 + l_aux
        bins = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", raw, o)
            o += 4
            bd = {}
            for _ in range(n_bin):
                b, loff, n_chunk = struct.unpack_from("<IQi", raw, o)
                o += 16
                cl = []
                for _ in range(n_chunk):
                    cb, ce = struct.unpack_from("<QQ", raw, o)
                    o += 16
                    cl.append((cb, ce))
                bd[b] = cl
            bins.append(bd)
        assert o == len(raw)

        def query(rid, contig, b1, e1):
            chunks = []
            for b in reg2bins_csi(b1 - 1, e1, min_shift, depth):
                chunks.extend(bins[rid].get(b, []))
            got = set()
            for cb, ce in sorted(set(chunks)):
                for r, pos0, rlen in self._scan_records(p, cb, ce):
                    if r == rid and pos0 < e1 and pos0 + rlen >= b1:
                        got.add((pos0 + 1, pos0 + rlen))
            want = {(pos, end) for c, pos, end in recs
                    if c == contig and pos <= e1 and end >= b1}
            assert got == want, (contig, b1, e1)

        for contig, rid in (("1", 0), ("2", 1)):
            query(rid, contig, 100, 150)
            query(rid, contig, 5000, 5300)
            query(rid, contig, 1, 10**6)
            query(rid, contig, 19000, 19001)
