"""Remaining spark-reader goldens (reference tests/run_spark_hdfs.py):
sample-sorted htsjdk rendering per query range, plus the last
phased-GT JSON and DS_ID loading goldens not covered elsewhere."""

import pytest

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, VCF_ATTRIBUTES_ORDER,
                          diff_strings, golden, run_calls, run_java_vcf,
                          run_loading, run_variants)

T012 = "inputs/callsets/t0_1_2.json"
T678 = "inputs/callsets/t6_7_8.json"
OVERLAP = "inputs/callsets/t0_overlapping.json"
COMBINED = "inputs/callsets/t0_1_2_combined.json"
HAPLOID = "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json"


def check(got, golden_name):
    want = golden(golden_name)
    assert got == want, diff_strings(got, want)


@pytest.mark.parametrize("callsets,vid,ranges,kw,name", [
    (T012, "inputs/vid.json", [(0, 100000)], {},
     "spark_t0_1_2_vcf_at_0"),
    (T012, "inputs/vid.json", [(12100, 12200)], {},
     "spark_t0_1_2_vcf_at_12100"),
    # these configs pair the htslib-style header with htsjdk records
    (OVERLAP, "inputs/vid.json", [(12202, 100000)],
     {"transform_header": False}, "spark_t0_overlapping_at_12202"),
    (T678, "inputs/vid.json", [(0, 10000000)],
     {"transform_header": False}, "spark_t6_7_8_vcf_at_0"),
    (T678, "inputs/vid.json", [(8029500, 10000000)],
     {"transform_header": False}, "spark_t6_7_8_vcf_at_8029500"),
    (T678, "inputs/vid.json", [(8029500, 8029500)],
     {"transform_header": False}, "spark_t6_7_8_vcf_at_8029500-8029500"),
    (COMBINED, "inputs/vid.json", [(0, 1000000)],
     {"transform_header": False}, "spark_t0_1_2_combined"),
    (HAPLOID, "inputs/vid_DS_ID_phased_GT.json", [(0, 1000000)], {},
     "spark_t0_haploid_triploid_1_2_3_triploid_deletion_java_vcf"),
    (HAPLOID, "inputs/vid_DS_ID_phased_GT.json", [(0, 1000000)],
     {"produce_GT_field": True},
     "spark_t0_haploid_triploid_1_2_3_triploid_deletion_java_vcf"
     "_produce_GT"),
])
def test_spark_goldens(callsets, vid, ranges, kw, name):
    check(run_java_vcf(callsets, VCF_ATTRIBUTES_ORDER, ranges,
                       vid_file=vid, sort_samples=True, **kw), name)


def test_t0_1_2_phased_variants_at_12150():
    check(run_variants(T012, QUERY_ATTRIBUTES_DEFAULT,
                       [(12150, 1000000000)],
                       vid_file="inputs/vid_phased_GT.json"),
          "t0_1_2_variants_at_12150_phased_GT")


def test_t6_7_8_phased_variants_at_0():
    check(run_variants(T678, QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)],
                       vid_file="inputs/vid_phased_GT.json"),
          "t6_7_8_variants_at_0_phased_GT")


def test_t6_7_8_phased_calls_at_8029500():
    check(run_calls(T678, QUERY_ATTRIBUTES_DEFAULT,
                    [(8029500, 1000000000)],
                    vid_file="inputs/vid_phased_GT.json"),
          "t6_7_8_calls_at_8029500_phased_GT")


def test_DS_ID_loading():
    check(run_loading(T012, vid_file="inputs/vid_DS_ID.json"),
          "t0_1_2_DS_ID_vcf_at_0")
