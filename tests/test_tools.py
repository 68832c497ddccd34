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


def test_split_files_and_histogram(tmp_path, capsys):
    """--split-files pre-splits inputs per partition; importing each split
    partition equals importing the original with partition bounds.
    vcf_histogram equi-partitions columns by cell count."""
    import json
    import numpy as np
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    from genomicsdb_tpu.tools import vcf2gdb, vcf_histogram

    loader = {
        "column_partitions": [
            {"begin": 0, "workspace": str(tmp_path / "ws"),
             "array_name": "p0"},
            {"begin": 12202, "workspace": str(tmp_path / "ws"),
             "array_name": "p1"},
        ],
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
    }
    lp = tmp_path / "loader.json"
    lp.write_text(json.dumps(loader))
    out_dir = str(tmp_path / "splits")
    vcf2gdb.main([str(lp), "--split-files", out_dir])
    # every original record lands in >=1 partition; partition files parse
    for i in (0, 1):
        d = os.path.join(out_dir, f"partition_{i}")
        files = os.listdir(d)
        assert files, f"partition_{i} empty"
        for f in files:
            with open(os.path.join(d, f)) as fh:
                text = fh.read()
            assert text.startswith("##fileformat")
    # partition 1 file only contains records intersecting [12202, inf)
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    split_vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    split_vid.callsets_dir = os.path.join(out_dir, "partition_1")
    for cs in split_vid.callsets.values():
        cs.filename = os.path.basename(cs.filename)
        if cs.filename.endswith(".gz"):
            cs.filename = cs.filename[:-3]
    ref_store = import_callsets(vid, column_partition=(12202, None))
    split_store = import_callsets(split_vid,
                                  column_partition=(12202, None))
    assert np.array_equal(ref_store.col, split_store.col)
    assert np.array_equal(ref_store.row, split_store.row)
    # histogram tool: bins + equi-partition JSON
    vcf_histogram.main([str(lp), "--bin-size", "1000",
                        "--num-partitions", "3"])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l]
    assert any("column_partitions" in l for l in lines)
    parts = json.loads(lines[-1])["column_partitions"]
    assert parts[0]["begin"] == 0 and len(parts) >= 2


def test_bgzf_output(tmp_path, capsys):
    """vcf_output_filename + vcf_output_format='z' writes BGZF
    (gzip-readable, htslib EOF marker) with identical text."""
    import gzip
    import json
    from genomicsdb_tpu.vcf.bgzf import BGZF_EOF, compress
    from genomicsdb_tpu.tools import gdb_query

    # unit: round-trip + EOF marker + block framing
    data = b"x" * 200000 + b"tail"
    blob = compress(data)
    assert blob.endswith(BGZF_EOF)
    assert gzip.decompress(blob) == data

    # CLI: same records as stdout mode, but BGZF into a file
    qdoc = {
        "workspace": "",
        "array_name": "",
        "query_column_ranges": [
            {"range_list": [{"low": 0, "high": 1000000000}]}],
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "attributes": ["REF", "ALT", "GT"],
        "scan_full": True,
    }
    ldoc = {
        "callset_mapping_file": qdoc["callset_mapping_file"],
        "vid_mapping_file": qdoc["vid_mapping_file"],
    }
    lp = tmp_path / "l.json"
    lp.write_text(json.dumps(ldoc))
    qp = tmp_path / "q.json"
    qp.write_text(json.dumps(qdoc))
    gdb_query.main(["-j", str(qp), "-l", str(lp),
                    "--produce-Broad-GVCF"])
    stdout_text = capsys.readouterr().out
    out_gz = str(tmp_path / "out.vcf.gz")
    qdoc["vcf_output_filename"] = out_gz
    qdoc["vcf_output_format"] = "z"
    qp.write_text(json.dumps(qdoc))
    gdb_query.main(["-j", str(qp), "-l", str(lp),
                    "--produce-Broad-GVCF"])
    with gzip.open(out_gz, "rt") as f:
        assert f.read() == stdout_text


def test_parallel_ranks_matches_inprocess(tmp_path):
    """--parallel-ranks (one worker PROCESS per rank, the reference's
    MPI model) must produce bytes identical to the in-process rank
    loop, including when ranks inherit their partition workspace/array
    from the loader JSON (update_from_loader,
    gt_mpi_gather.cc:550-557)."""
    import json
    import subprocess
    import sys

    ws = str(tmp_path / "ws")
    loader = {
        "column_partitions": [
            {"begin": 0, "workspace": ws, "array_name": "p0"},
            {"begin": 12202, "workspace": ws, "array_name": "p1"},
            {"begin": 17000, "workspace": ws, "array_name": "p2"},
        ],
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
        "reference_genome": os.path.join(
            REF_TESTS, "inputs/chr1_10MB.fasta.gz"),
        "vcf_header_filename": os.path.join(
            REF_TESTS, "inputs/template_vcf_header.vcf"),
        "treat_deletions_as_intervals": True,
    }
    lp = tmp_path / "l.json"
    lp.write_text(json.dumps(loader))
    query = {
        "workspace": "", "array_name": "",
        "query_column_ranges": [
            {"range_list": [{"low": 0, "high": 1000000000}]}],
        "vid_mapping_file": loader["vid_mapping_file"],
        "callset_mapping_file": loader["callset_mapping_file"],
        "reference_genome": loader["reference_genome"],
        "vcf_header_filename": [loader["vcf_header_filename"]],
        "attributes": ["REF", "ALT", "DP", "GT", "GQ", "AD", "PL",
                       "MIN_DP", "DP_FORMAT"],
    }
    qp = tmp_path / "q.json"
    qp.write_text(json.dumps(query))
    # import the partitions (rank-per-partition worker processes)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for r in range(3):
        subprocess.run(
            [sys.executable, "-m", "genomicsdb_tpu.tools.vcf2gdb",
             str(lp), "--rank", str(r)], check=True,
            capture_output=True, env=env)
    base = ["-j", str(qp), "-l", str(lp), "--num-ranks", "3",
            "--produce-Broad-GVCF", "--platform", "cpu"]
    inproc = subprocess.run(
        [sys.executable, "-m", "genomicsdb_tpu.tools.gdb_query", *base],
        capture_output=True, env=env)
    assert inproc.returncode == 0, inproc.stderr.decode()[-500:]
    par = subprocess.run(
        [sys.executable, "-m", "genomicsdb_tpu.tools.gdb_query", *base,
         "--parallel-ranks"], capture_output=True, env=env)
    assert par.returncode == 0, par.stderr.decode()[-500:]
    assert par.stdout == inproc.stdout
    assert len(inproc.stdout) > 1000
