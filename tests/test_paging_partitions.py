"""Paged output, result serialization (gather), multi-partition queries."""

import os

import numpy as np

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, VCF_ATTRIBUTES_ORDER,
                          REF_TESTS, diff_strings, golden, load_setup,
                          make_query_params)

from genomicsdb_tpu.query import driver


def test_batched_vcf_pages_equal_full():
    """batched_vcf query type: '-p 128' paged output == full output."""
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    template = os.path.join(REF_TESTS, "inputs/template_vcf_header.vcf")
    refg = os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz")
    full = driver.run_vcf_query(store, qc, qp, vid, template, refg)
    qc2 = driver.make_query_config(qp, vid)
    pages = list(driver.run_vcf_query_paged(store, qc2, qp, vid, 128,
                                            template, refg))
    assert len(pages) > 10  # actually paged
    assert all(len(p) >= 128 for p in pages[:-1])
    got = b"".join(pages).decode()
    want = golden("t0_1_2_vcf_at_0")
    assert got == want, diff_strings(got, want)


def test_variants_serialize_roundtrip():
    """Binary serialize/deserialize (MPI_Gatherv analog) preserves the
    printed variants JSON byte-for-byte."""
    from genomicsdb_tpu.query import json_output, serialize
    from genomicsdb_tpu.query.variants_path import gt_get_column_interval
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    variants = gt_get_column_interval(store, qc, (0, 1000000000))
    direct = json_output.print_variants_json(variants, qc)
    blob = serialize.serialize_variants(variants, qc)
    assert isinstance(blob, bytes) and len(blob) > 100
    restored = serialize.deserialize_variants(blob, qc, store)
    roundtrip = json_output.print_variants_json(restored, qc)
    want = golden("t0_1_2_variants_at_0")
    assert direct == want
    assert roundtrip == want, diff_strings(roundtrip, want)


def test_multi_partition_gather_equals_whole():
    """3 column partitions with boundaries in empty regions: concatenated
    per-partition combine == whole-array combine (rank fan-out + ordered
    gather, gt_mpi_gather.cc:322-366)."""
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    # boundaries at 13000/15000: between 12294 (last ref block end) and
    # 17384 (variant site), so no spanning cells
    parts = [(0, 12999), (13000, 14999), (15000, None)]
    template = os.path.join(REF_TESTS, "inputs/template_vcf_header.vcf")
    refg = os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz")
    pieces = []
    for i, (lo, hi) in enumerate(parts):
        store = import_callsets(vid, base_dir=REF_TESTS,
                                column_partition=(lo, hi))
        from genomicsdb_tpu.core.config import INT64_MAX
        qp = make_query_params(
            VCF_ATTRIBUTES_ORDER,
            [(lo, hi if hi is not None else INT64_MAX - 1)])
        qc = driver.make_query_config(qp, vid)
        pieces.append(driver.run_vcf_query(
            store, qc, qp, vid,
            template_path=template if i == 0 else None,
            reference_path=refg))
    got = "".join(pieces)
    want = golden("t0_1_2_vcf_at_0")
    assert got == want, diff_strings(got, want)


def test_multi_partition_spanning_boundary_splits_records():
    """A partition boundary inside a ref block splits the record at the
    boundary (partition-begin replay semantics, load_operators.cc:33-79)."""
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    # boundary at column 12200 (VCF pos 12201) inside ref blocks
    store = import_callsets(vid, base_dir=REF_TESTS,
                            column_partition=(12200, None))
    from genomicsdb_tpu.core.config import INT64_MAX
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(12200, INT64_MAX - 1)])
    qc = driver.make_query_config(qp, vid)
    out = driver.run_vcf_query(
        store, qc, qp, vid, template_path=None,
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    lines = [l for l in out.splitlines() if l and not l.startswith("#")]
    first = lines[0].split("\t")
    # record starts exactly at the partition begin (VCF pos 12201), REF is
    # the fasta base, END is the original block end
    assert first[1] == "12201"
    assert first[3] in "ACGTN" and len(first[3]) == 1
    assert "END=12277" in first[7]


def test_stream_feature_reader():
    from genomicsdb_tpu.query.stream import FeatureReader
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    fr = FeatureReader(store, qc, vid)
    recs = list(fr.query("1", 12141, 18000))
    assert [r[1] for r in recs] == [12141, 12145, 12278, 17385]
    assert all(r[0] == "1" for r in recs)
