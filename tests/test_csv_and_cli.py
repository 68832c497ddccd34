"""CSV import, CLI drivers, workspace persistence + consolidation."""

import io
import json
import os

import pytest

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, VCF_ATTRIBUTES_ORDER,
                          REF_TESTS, diff_strings, golden, run_calls,
                          run_loading, run_variants, run_vcf)

CSV = "inputs/callsets/t0_1_2_csv.json"


def check(got, golden_name):
    want = golden(golden_name)
    assert got == want, diff_strings(got, want)


def test_csv_loading():
    check(run_loading(CSV), "t0_1_2_loading")


def test_csv_calls_at_0():
    check(run_calls(CSV, QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)]),
          "t0_1_2_calls_at_0")


def test_csv_vcf_at_12150():
    check(run_vcf(CSV, VCF_ATTRIBUTES_ORDER, [(12150, 1000000000)]),
          "t0_1_2_vcf_at_12150")


def test_csv_variants_at_0():
    check(run_variants(CSV, QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)]),
          "t0_1_2_variants_at_0")


# ---------------- CLI end-to-end ----------------

def _loader_json(tmp_path, ws_dir, array_name="t0_1_2",
                 callset="inputs/callsets/t0_1_2.json"):
    doc = {
        "row_based_partitioning": False,
        "column_partitions": [{"begin": 0, "workspace": str(ws_dir),
                               "array_name": array_name}],
        "callset_mapping_file": os.path.join(REF_TESTS, callset),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
        "treat_deletions_as_intervals": True,
        "vcf_header_filename": os.path.join(
            REF_TESTS, "inputs/template_vcf_header.vcf"),
        "reference_genome": os.path.join(REF_TESTS,
                                         "inputs/chr1_10MB.fasta.gz"),
        "produce_combined_vcf": True,
        "produce_tiledb_array": True,
        "delete_and_create_tiledb_array": True,
        "segment_size": 40,
    }
    p = tmp_path / "loader.json"
    p.write_text(json.dumps(doc))
    return str(p)


def _query_json(tmp_path, ws_dir, attributes, low=0, high=1000000000,
                array_name="t0_1_2"):
    doc = {
        "workspace": str(ws_dir),
        "array_name": array_name,
        "query_column_ranges": [
            {"range_list": [{"low": low, "high": high}]}],
        "query_row_ranges": [{"range_list": [{"low": 0, "high": 3}]}],
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "reference_genome": os.path.join(REF_TESTS,
                                         "inputs/chr1_10MB.fasta.gz"),
        "vcf_header_filename": [os.path.join(
            REF_TESTS, "inputs/template_vcf_header.vcf")],
        "attributes": attributes,
        "segment_size": 40,
    }
    p = tmp_path / "query.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_vcf2gdb_and_gdb_query(tmp_path, capsys):
    from genomicsdb_tpu.tools import gdb_query, vcf2gdb
    ws_dir = tmp_path / "ws"
    loader = _loader_json(tmp_path, ws_dir)
    buf = io.StringIO()
    vcf2gdb.run_import(loader, rank=0, out=buf)
    check(buf.getvalue(), "t0_1_2_loading")
    # query from the persisted workspace
    qjson = _query_json(tmp_path, ws_dir, QUERY_ATTRIBUTES_DEFAULT)
    gdb_query.main(["-j", qjson, "--print-calls"])
    out = capsys.readouterr().out
    check(out, "t0_1_2_calls_at_0")
    # Broad GVCF from workspace
    qjson2 = _query_json(tmp_path, ws_dir, VCF_ATTRIBUTES_ORDER)
    gdb_query.main(["-j", qjson2, "--produce-Broad-GVCF"])
    out = capsys.readouterr().out
    check(out, "t0_1_2_vcf_at_0")
    # block engine produces identical bytes through the CLI
    gdb_query.main(["-j", qjson2, "--produce-Broad-GVCF",
                    "--engine", "block"])
    out = capsys.readouterr().out
    check(out, "t0_1_2_vcf_at_0")


def test_workspace_fragments_and_consolidation(tmp_path):
    """Two-fragment import (incremental cohort add) + consolidation
    equals single-shot import (consolidate_and_vcf test equivalent)."""
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store import workspace as ws
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    from genomicsdb_tpu.query import driver
    from golden_utils import make_query_params

    ws_dir = str(tmp_path / "ws")
    ws.create_workspace(ws_dir)
    # fragment 1: t0 only; fragment 2: t1+t2
    vid_all = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    import copy
    vid1 = copy.deepcopy(vid_all)
    vid1.callsets = {k: v for k, v in vid_all.callsets.items()
                     if v.row_idx == 0}
    vid1.rows = {0: vid_all.rows[0]}
    vid2 = copy.deepcopy(vid_all)
    vid2.callsets = {k: v for k, v in vid_all.callsets.items()
                     if v.row_idx > 0}
    vid2.rows = {r: vid_all.rows[r] for r in (1, 2)}
    s1 = import_callsets(vid1, base_dir=REF_TESTS)
    s2 = import_callsets(vid2, base_dir=REF_TESTS)
    ws.write_fragment(ws_dir, "arr", s1)
    ws.write_fragment(ws_dir, "arr", s2)
    assert len(ws._fragment_paths(ws_dir, "arr")) == 2
    merged = ws.open_array(ws_dir, "arr")
    merged.num_rows = 3
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid_all)
    got = driver.run_vcf_query(
        merged, qc, qp, vid_all,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    check(got, "t0_1_2_vcf_at_0")
    # consolidate -> single fragment, same result
    ws.consolidate_array(ws_dir, "arr")
    assert len(ws._fragment_paths(ws_dir, "arr")) == 1
    merged2 = ws.open_array(ws_dir, "arr")
    merged2.num_rows = 3
    got2 = driver.run_vcf_query(
        merged2, qc, qp, vid_all,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    check(got2, "t0_1_2_vcf_at_0")


def test_gdb_query_paged_cli(tmp_path, capsys):
    """-p page_size produces byte-identical output via the paged path."""
    from genomicsdb_tpu.tools import gdb_query, vcf2gdb
    ws_dir = tmp_path / "ws"
    loader = _loader_json(tmp_path, ws_dir)
    buf = io.StringIO()
    vcf2gdb.run_import(loader, rank=0, out=buf)
    qjson = _query_json(tmp_path, ws_dir, VCF_ATTRIBUTES_ORDER)
    gdb_query.main(["-j", qjson, "--produce-Broad-GVCF"])
    whole = capsys.readouterr().out
    gdb_query.main(["-j", qjson, "--produce-Broad-GVCF", "-p", "128"])
    paged = capsys.readouterr().out
    assert paged == whole
    check(whole, "t0_1_2_vcf_at_0")
