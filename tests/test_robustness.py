"""Loader/writer robustness: cross-loader malformed-token parity,
htslib-width BCF int encoding, streaming BCF writer identity, and
workspace schema guards (round-1 advisor findings)."""

import numpy as np
import pytest

from genomicsdb_tpu.runtime import native_loader
from genomicsdb_tpu.store.columnar import ColumnarStore, FieldData
from genomicsdb_tpu.store import workspace as ws
from genomicsdb_tpu.vcf import bcf, bgzf


pytestmark = []


def _spans(text: bytes):
    starts = np.array([0], dtype=np.int64)
    ends = np.array([len(text)], dtype=np.int64)
    return starts, ends


class TestNativeParseParity:
    def test_malformed_int_raises(self):
        if native_loader.get_lib() is None:
            pytest.skip("no native lib")
        text = b"1,2.5,3"
        with pytest.raises(ValueError):
            native_loader.parse_int_lists(text, *_spans(text))

    def test_overflow_int_raises(self):
        if native_loader.get_lib() is None:
            pytest.skip("no native lib")
        text = b"99999999999"
        with pytest.raises(ValueError):
            native_loader.parse_int_lists(text, *_spans(text))

    def test_malformed_gt_raises(self):
        if native_loader.get_lib() is None:
            pytest.skip("no native lib")
        text = b"0/x"
        with pytest.raises(ValueError):
            native_loader.parse_gt(text, *_spans(text), store_phase=False)

    def test_valid_ints_still_parse(self):
        if native_loader.get_lib() is None:
            pytest.skip("no native lib")
        text = b"1,.,-7,2147483647,-2147483647"
        vals, offs = native_loader.parse_int_lists(text, *_spans(text))
        assert list(vals) == [1, np.iinfo(np.int32).min, -7,
                              2**31 - 1, -(2**31 - 1)]

    def test_int32_min_literal_rejected(self):
        # INT32_MIN is the missing sentinel; a literal cannot round-trip
        if native_loader.get_lib() is None:
            pytest.skip("no native lib")
        text = b"-2147483648"
        with pytest.raises(ValueError):
            native_loader.parse_int_lists(text, *_spans(text))


class TestBCFIntWidth:
    def test_int16_lower_bound_matches_htslib(self):
        # htslib BCF_MIN_BT_INT16 is -32760: values in [-32760, -32001]
        # must encode as int16, below as int32
        assert bcf._int_width([-32760]) == bcf.BCF_BT_INT16
        assert bcf._int_width([-32761]) == bcf.BCF_BT_INT32
        assert bcf._int_width([-121]) == bcf.BCF_BT_INT16
        assert bcf._int_width([-120]) == bcf.BCF_BT_INT8
        assert bcf._typed_int(-32500)[0] & 0xF == bcf.BCF_BT_INT16


VCF_TEXT = """##fileformat=VCFv4.1
##contig=<ID=1,length=249250621>
##INFO=<ID=END,Number=1,Type=Integer,Description="">
##FORMAT=<ID=GT,Number=1,Type=String,Description="">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1
1\t100\t.\tA\t<NON_REF>\t.\t.\tEND=199\tGT:DP\t./.:7\t./.:.
1\t200\t.\tG\tT,<NON_REF>\t.\t.\t.\tGT:DP\t./.:40000\t./.:3
"""


class TestStreamingBCFWriter:
    def test_identical_to_batch_encoder(self, tmp_path):
        p = tmp_path / "out.bcf"
        with bgzf.BCFFileWriter(str(p)) as w:
            # feed in awkward chunks straddling line boundaries
            for i in range(0, len(VCF_TEXT), 17):
                w.write(VCF_TEXT[i:i + 17])
        got = p.read_bytes()
        want = bgzf.compress(bcf.text_to_bcf(VCF_TEXT))
        assert got == want
        assert not (tmp_path / "out.bcf.spool.tmp").exists()

    def test_round_trip(self, tmp_path):
        import gzip
        p = tmp_path / "out.bcf"
        with bgzf.BCFFileWriter(str(p)) as w:
            w.write(VCF_TEXT)
        body = gzip.decompress(p.read_bytes())
        text = bcf.bcf_to_text(body)
        assert "1\t200\t.\tG\tT,<NON_REF>" in text


def _tiny_store(attrs):
    s = ColumnarStore(num_rows=1)
    s.attribute_order = list(attrs)
    s.row = np.array([0], dtype=np.int64)
    s.col = np.array([5], dtype=np.int64)
    s.end = np.array([5], dtype=np.int64)
    s.eff_end = np.array([5], dtype=np.int64)
    for a in attrs:
        s.fields[a] = FieldData(name=a, kind="fixed", dtype="int32",
                                valid=np.array([True]),
                                values=np.array([[1]], dtype=np.int32))
    return s


class TestWorkspaceSchemaGuard:
    def test_mismatched_fragment_rejected(self, tmp_path):
        w = str(tmp_path / "wsp")
        ws.create_workspace(w)
        ws.write_fragment(w, "arr", _tiny_store(["END", "DP"]))
        with pytest.raises(ValueError, match="attribute set"):
            ws.write_fragment(w, "arr", _tiny_store(["END", "GQ"]))

    def test_matching_fragment_accepted(self, tmp_path):
        w = str(tmp_path / "wsp")
        ws.create_workspace(w)
        ws.write_fragment(w, "arr", _tiny_store(["END", "DP"]))
        ws.write_fragment(w, "arr", _tiny_store(["END", "DP"]))
        store = ws.open_array(w, "arr")
        assert store.num_cells == 2
