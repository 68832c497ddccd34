"""Native columnar-direct import == Python reference import."""

import os

import numpy as np
import pytest

from golden_utils import (REF_TESTS, VCF_ATTRIBUTES_ORDER, diff_strings,
                          golden, make_query_params)

from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.runtime import native_loader as nl
from genomicsdb_tpu.store import workspace as ws
from genomicsdb_tpu.store.fast_import import fast_import_file
from genomicsdb_tpu.store.import_pipeline import import_callsets


def _stores_equal(a, b):
    np.testing.assert_array_equal(a.row, b.row)
    np.testing.assert_array_equal(a.col, b.col)
    np.testing.assert_array_equal(a.end, b.end)
    np.testing.assert_array_equal(a.eff_end, b.eff_end)
    assert a.attribute_order == b.attribute_order
    for name in a.attribute_order:
        fa, fb = a.fields[name], b.fields[name]
        assert fa.kind == fb.kind, name
        np.testing.assert_array_equal(fa.valid, fb.valid, err_msg=name)
        for i in range(a.num_cells):
            va = fa.cell_value(i) if fa.valid[i] else None
            vb = fb.cell_value(i) if fb.valid[i] else None
            if va is None:
                assert vb is None, (name, i)
            elif isinstance(va, str):
                assert va == vb, (name, i)
            elif fa.kind == "ragged2d":
                assert len(va) == len(vb), (name, i)
                for k, (sa, sb) in enumerate(zip(va, vb)):
                    _arrays_bit_equal(np.asarray(sa), np.asarray(sb),
                                      f"{name}@{i}[{k}]")
            else:
                _arrays_bit_equal(np.asarray(va), np.asarray(vb),
                                  f"{name}@{i}")


def _arrays_bit_equal(a, b, msg):
    """Bit-exact: NaN payloads matter (bcf FLOAT_MISSING vs a parsed
    quiet NaN render differently)."""
    assert a.dtype == b.dtype, (msg, a.dtype, b.dtype)
    if a.dtype == np.float32:
        np.testing.assert_array_equal(a.view(np.uint32),
                                      b.view(np.uint32), err_msg=msg)
    else:
        np.testing.assert_array_equal(a, b, err_msg=msg)


@pytest.mark.parametrize("callset,vid_file", [
    ("inputs/callsets/t0_1_2.json", "inputs/vid.json"),
    ("inputs/callsets/t0_1_2.json", "inputs/vid_phased_GT.json"),
    ("inputs/callsets/t6_7_8.json", "inputs/vid.json"),
    ("inputs/callsets/min_PL_spanning_deletion.json",
     "inputs/vid_phased_GT.json"),
    ("inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json",
     "inputs/vid_DS_ID_phased_GT.json"),
    ("inputs/callsets/t0_overlapping.json", "inputs/vid.json"),
    ("inputs/callsets/t0_1_2_combined.json", "inputs/vid.json"),
    # allele-specific 2-D INFO annotations (AS_RAW_MQ element_wise_sum +
    # AS_RAW_MQRankSum histogram tuple) through the ragged2d fast path
    ("inputs/callsets/t0_1_2_all_asa.json", "inputs/vid_all_asa.json"),
])
def test_fast_import_matches_python(callset, vid_file, monkeypatch):
    if nl.get_lib() is None:
        pytest.skip("no native toolchain")
    vid = VidMapper.from_files(os.path.join(REF_TESTS, vid_file),
                               os.path.join(REF_TESTS, callset))
    # force the pure-Python reference path: import_callsets otherwise
    # takes the native fast path itself, making the comparison vacuous
    monkeypatch.setenv("GENOMICSDB_TPU_NO_NATIVE", "1")
    python_store = import_callsets(vid, base_dir=REF_TESTS)
    monkeypatch.delenv("GENOMICSDB_TPU_NO_NATIVE")
    # per-file fast import + merge
    files = {}
    for cs in vid.callsets.values():
        files.setdefault(cs.filename, {})[cs.idx_in_file] = cs.row_idx
    stores = []
    for fname, idx_to_row in files.items():
        path = os.path.join(REF_TESTS, fname)
        st = fast_import_file(path, vid, idx_to_row)
        assert st is not None, fname
        stores.append(st)
    fast_store = ws.merge_stores(stores) if len(stores) > 1 else stores[0]
    if len(stores) == 1:
        # single fragment: sort + eff_end via merge path for parity
        fast_store = ws.merge_stores([stores[0]])
    fast_store.num_rows = python_store.num_rows
    _stores_equal(python_store, fast_store)


def test_fast_import_golden_end_to_end():
    if nl.get_lib() is None:
        pytest.skip("no native toolchain")
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    files = {}
    for cs in vid.callsets.values():
        files.setdefault(cs.filename, {})[cs.idx_in_file] = cs.row_idx
    stores = [fast_import_file(os.path.join(REF_TESTS, f), vid, m)
              for f, m in files.items()]
    store = ws.merge_stores(stores)
    store.num_rows = vid.max_callset_row_idx() + 1
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    got = driver.run_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    want = golden("t0_1_2_vcf_at_0")
    assert got == want, diff_strings(got, want)


def test_bcf_input_import(tmp_path):
    """BCF2 input files import identically to their VCF text source
    (reference parity: vcf2binary.cc reads VCF or BCF via htslib) —
    through both the native fast path and the Python reader."""
    import gzip
    import os

    import numpy as np

    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store.fast_import import fast_import_file
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    from genomicsdb_tpu.vcf.bcf import text_to_bcf
    from genomicsdb_tpu.vcf.bgzf import compress

    ref_tests = os.environ.get("GENOMICSDB_TPU_REF_TESTS",
                               "/root/reference/tests")
    src = os.path.join(ref_tests, "inputs/vcfs/t0.vcf.gz")
    text = gzip.decompress(open(src, "rb").read()).decode()
    bcf_path = str(tmp_path / "t0.bcf")
    with open(bcf_path, "wb") as f:
        f.write(compress(text_to_bcf(text)))
    vcf_path = str(tmp_path / "t0.vcf")
    with open(vcf_path, "w") as f:
        f.write(text)

    vid = VidMapper.from_files(os.path.join(ref_tests,
                                            "inputs/vid.json"))
    want = fast_import_file(vcf_path, vid, {0: 0})
    got = fast_import_file(bcf_path, vid, {0: 0})
    assert got is not None and want is not None
    np.testing.assert_array_equal(got.col, want.col)
    np.testing.assert_array_equal(got.row, want.row)
    np.testing.assert_array_equal(got.end, want.end)
    for name, fd in want.fields.items():
        gfd = got.fields[name]
        np.testing.assert_array_equal(gfd.valid, fd.valid, err_msg=name)
        if fd.values is not None:
            np.testing.assert_array_equal(gfd.values, fd.values,
                                          err_msg=name)

    # python loader path (VCFFile/open_text) handles .bcf too
    for path in (bcf_path, vcf_path):
        vid_i = VidMapper.from_files(os.path.join(ref_tests,
                                                  "inputs/vid.json"))
        vid_i.parse_callsets({"callsets": {"HG00141": {
            "row_idx": 0, "idx_in_file": 0, "filename": path}}})
        os.environ["GENOMICSDB_TPU_NO_NATIVE"] = "1"
        try:
            st = import_callsets(vid_i)
        finally:
            del os.environ["GENOMICSDB_TPU_NO_NATIVE"]
        np.testing.assert_array_equal(st.col, want.col)


def test_fmt_cohort_edge_cases(tmp_path, monkeypatch):
    """The cohort-wide two-pass FORMAT parser (gdb_fmt_cohort) against
    the Python reference path on crafted edge inputs: truncated sample
    columns, all-missing segments ('.', '.,.'), phased / missing GT,
    int8/16/32-boundary values, fixed-width overflow, empty fields."""
    if nl.get_lib() is None or not hasattr(nl.get_lib(),
                                           "gdb_fmt_cohort"):
        pytest.skip("no cohort parse kernel")
    vcf = tmp_path / "edge.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.1",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        '##FORMAT=<ID=AD,Number=.,Type=Integer,Description="a">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
        '##FORMAT=<ID=AF,Number=1,Type=Float,Description="f">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
        '##contig=<ID=1,length=100000>',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
        "\tS0\tS1\tS2",
        # truncated sample columns (GT only; GT+AD)
        "1\t10\t.\tA\tG\t.\t.\t.\tGT:AD:DP:GQ:PL\t0/1\t0/0:3,4\t"
        "1/1:5,6:7:8:9,10,11",
        # all-missing numeric segments -> invalid; '.' GT stays valid
        "1\t20\t.\tC\tT\t.\t.\t.\tGT:AD:DP\t.:.,.:.\t./.:.:.\t0|1:.,3:5",
        # int width boundaries (int8/int16/int32 packing downstream)
        "1\t30\t.\tG\tA\t.\t.\t.\tGT:PL:DP\t0/0:0,120,-120:127\t"
        "0/1:-32760,32767,1:32768\t1/1:2147483647,-2147483647,5:1",
        # float FORMAT + empty trailing field + phased triploid GT
        "1\t40\t.\tT\tC\t.\t.\t.\tGT:AF:GQ\t0|1|2:0.25:9\t.\t0/0:.:3",
    ]) + "\n")
    vid = VidMapper.from_files(os.path.join(REF_TESTS, "inputs/vid.json"))
    # vid.json declares GT(P)/AD(R)/DP/GQ/PL(G); AF is absent -> ignore
    vid.parse_callsets({"callsets": {
        f"S{i}": {"row_idx": i, "idx_in_file": i, "filename": str(vcf)}
        for i in range(3)}})
    native = import_callsets(vid)
    monkeypatch.setenv("GENOMICSDB_TPU_NO_NATIVE", "1")
    python = import_callsets(vid)
    monkeypatch.delenv("GENOMICSDB_TPU_NO_NATIVE")
    _stores_equal(python, native)
