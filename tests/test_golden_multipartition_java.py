"""Multi-partition (chromosome-interval) imports queried through the
htsjdk renderer + spark-ordered outputs + remaining special goldens."""

import os

import pytest

from golden_utils import (ASA_VCF_ATTRIBUTES, QUERY_ATTRIBUTES_DEFAULT,
                          REF_TESTS, VCF_ATTRIBUTES_ORDER, diff_strings,
                          golden, make_query_params, run_calls, run_loading,
                          run_variants)

from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store.import_pipeline import import_callsets


def check(got, golden_name):
    want = golden(golden_name)
    assert got == want, diff_strings(got, want)


def java_query_partitions(callset, vid_file, partitions, query_range,
                          attributes=None):
    """Import per chromosome-interval partition, java-render each rank's
    clamped query, stitch in partition order (the Java GenomicsDBFeatureReader
    over per-partition arrays)."""
    vid = VidMapper.from_files(os.path.join(REF_TESTS, vid_file),
                               os.path.join(REF_TESTS, callset))
    pieces = []
    first = True
    for lo, hi in partitions:
        if hi < query_range[0] or lo > query_range[1]:
            continue
        store = import_callsets(vid, base_dir=REF_TESTS,
                                column_partition=(lo, hi))
        qp = make_query_params(attributes or VCF_ATTRIBUTES_ORDER,
                               [(max(lo, query_range[0]),
                                 min(hi, query_range[1]))])
        qc = driver.make_query_config(qp, vid)
        pieces.append(driver.run_java_vcf_query(
            store, qc, qp, vid,
            template_path=os.path.join(
                REF_TESTS, "inputs/template_vcf_header.vcf")
            if first else None,
            reference_path=os.path.join(REF_TESTS,
                                        "inputs/chr1_10MB.fasta.gz")))
        first = False
    return "".join(pieces)


T678_PARTS = [(0, 8029499), (8029500, 8029500), (8029501, 9999999)]
T012_PARTS = [(0, 12159), (12160, 12199), (12200, 17999)]


def test_java_t6_7_8_multi_contig_at_8029500():
    got = java_query_partitions("inputs/callsets/t6_7_8.json",
                                "inputs/vid_phased_GT.json", T678_PARTS,
                                (8029500, 8029509))
    check(got, "java_t6_7_8_vcf_at_8029500")


def test_java_t6_7_8_multi_contig_at_8029501():
    got = java_query_partitions("inputs/callsets/t6_7_8.json",
                                "inputs/vid_phased_GT.json", T678_PARTS,
                                (8029501, 8029501))
    check(got, "java_t6_7_8_vcf_at_8029501")


def test_java_t0_1_2_multi_contig_0_18000():
    got = java_query_partitions("inputs/callsets/t0_1_2.json",
                                "inputs/vid_phased_GT.json", T012_PARTS,
                                (0, 17999))
    check(got,
          "java_genomicsdb_importer_from_vcfs_t0_1_2_multi_contig_vcf_0_18000")


def test_java_t0_1_2_multi_contig_12150_18000():
    got = java_query_partitions("inputs/callsets/t0_1_2.json",
                                "inputs/vid_phased_GT.json", T012_PARTS,
                                (12150, 17999))
    check(got,
          "java_genomicsdb_importer_from_vcfs_t0_1_2_multi_contig_vcf_12150_18000")


def test_java_asa_query():
    from golden_utils import run_java_vcf
    got = run_java_vcf("inputs/callsets/t0_1_2_all_asa.json",
                       ASA_VCF_ATTRIBUTES, [(0, 1000000000)],
                       vid_file="inputs/vid_all_asa.json")
    check(got, "t0_1_2_all_asa_java_query_vcf")


# ---------------- remaining matrix stragglers ----------------

DS_ID_ATTRS = QUERY_ATTRIBUTES_DEFAULT + ["DS", "ID"]


def test_DS_ID_phased_calls():
    check(run_calls("inputs/callsets/t0_1_2.json", DS_ID_ATTRS,
                    [(0, 1000000000)],
                    vid_file="inputs/vid_DS_ID_phased_GT.json"),
          "t0_1_2_DS_ID_calls_at_0_phased_GT")


def test_DS_ID_phased_variants():
    check(run_variants("inputs/callsets/t0_1_2.json", DS_ID_ATTRS,
                       [(0, 1000000000)],
                       vid_file="inputs/vid_DS_ID_phased_GT.json"),
          "t0_1_2_DS_ID_variants_at_0_phased_GT")


def test_new_fields_loading():
    check(run_loading("inputs/callsets/t6_7_8.json",
                      vid_file="inputs/vid_MLEAC_MLEAF.json"),
          "t6_7_8_new_field_gatk.vcf")


def test_spark_sample_sorted_vcf_at_12150():
    """Spark reader output: sample columns sorted by name
    (spark/GenomicsDBRDD path)."""
    from golden_utils import load_setup
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(12150, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    got = driver.run_java_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"),
        sort_samples=True)
    check(got, "spark_t0_1_2_vcf_at_12150")
