"""vcfdiff, workspace CLI, profiling utilities, native kernels."""

import os

import numpy as np
import pytest

from golden_utils import REF_TESTS


def _write_golden_as_vcf(tmp_path, name):
    src = os.path.join(REF_TESTS, "golden_outputs", name)
    dst = tmp_path / (name + ".vcf")
    dst.write_text(open(src).read())
    return str(dst)


def test_vcfdiff_equal(tmp_path):
    from genomicsdb_tpu.tools.vcfdiff import vcfdiff
    a = _write_golden_as_vcf(tmp_path, "t0_1_2_vcf_at_0")
    assert vcfdiff(a, a) == []


def test_vcfdiff_allele_reorder_tolerated(tmp_path):
    """Same record with ALT order swapped + remapped AD/PL compares equal."""
    from genomicsdb_tpu.tools.vcfdiff import vcfdiff
    hdr = ("##fileformat=VCFv4.1\n"
           '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">\n'
           '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n'
           '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="a">\n'
           '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">\n'
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
    gold = hdr + "1\t100\t.\tG\tA,T\t.\t.\tDP=5\tGT:AD:PL\t" \
        "0/1:10,20,30:1,2,3,4,5,6\n"
    # swap A and T: AD reorders [10,30,20]; PL genotype reorder:
    # combos gold (0,0)(0,1)(1,1)(0,2)(1,2)(2,2) -> test allele map A<->T
    test = hdr + "1\t100\t.\tG\tT,A\t.\t.\tDP=5\tGT:AD:PL\t" \
        "0/2:10,30,20:1,4,6,2,5,3\n"
    g = tmp_path / "g.vcf"
    g.write_text(gold)
    t = tmp_path / "t.vcf"
    t.write_text(test)
    assert vcfdiff(str(g), str(t)) == []


def test_vcfdiff_detects_value_change(tmp_path):
    from genomicsdb_tpu.tools.vcfdiff import vcfdiff
    a = _write_golden_as_vcf(tmp_path, "t0_1_2_vcf_at_0")
    text = open(a).read().replace("DP=276", "DP=275")
    b = tmp_path / "changed.vcf"
    b.write_text(text)
    errs = vcfdiff(a, str(b))
    assert any("DP" in e for e in errs)


def test_workspace_cli(tmp_path, capsys):
    from genomicsdb_tpu.tools import workspace_tool
    ws_dir = str(tmp_path / "ws")
    assert workspace_tool.main(["create", ws_dir]) == 0
    assert workspace_tool.main(["list", ws_dir]) == 0


def test_profile_stats(capsys):
    from genomicsdb_tpu.core.profile import ProfileStats
    st = ProfileStats()
    st.bump("cells_traversed", 10)
    with st.phase("array-query"):
        pass
    import io
    buf = io.StringIO()
    st.report(buf)
    out = buf.getvalue()
    assert "#cells_traversed : 10" in out
    assert "array-query" in out


def test_native_kernels_match_python():
    """Native tokenizer/parsers agree with the Python VCF reader."""
    nl = pytest.importorskip("genomicsdb_tpu.runtime.native_loader")
    if nl.get_lib() is None:
        pytest.skip("no native toolchain")
    import gzip
    data = gzip.open(os.path.join(
        REF_TESTS, "inputs/vcfs/t0_1_2_combined.vcf.gz"), "rb").read()
    body = data.split(b"#CHROM", 1)[1]
    records = body.split(b"\n", 1)[1]
    toks = nl.tokenize_records(records)
    assert toks is not None
    offs, ncols = toks
    from genomicsdb_tpu.vcf.reader import parse_record
    lines = [l for l in records.decode().split("\n") if l.strip()]
    assert len(offs) == len(lines)
    for i, line in enumerate(lines):
        cols = line.split("\t")
        assert ncols[i] == len(cols)
        for k in range(len(cols)):
            lo = offs[i][k]
            hi = offs[i][k + 1] - 1
            assert records[lo:hi].decode() == cols[k]
    # numeric POS parsing
    pos_starts = offs[:, 1]
    pos_ends = offs[:, 2] - 1
    vals, off2 = nl.parse_int_lists(records, pos_starts.copy(),
                                    pos_ends.copy())
    expect = [parse_record(l).pos for l in lines]
    assert vals.tolist() == expect
