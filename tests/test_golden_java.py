"""htsjdk-rendered (java_vcf) golden outputs."""

import pytest

from golden_utils import (VCF_ATTRIBUTES_ORDER, diff_strings, golden,
                          run_java_vcf)

T012 = "inputs/callsets/t0_1_2.json"
T678 = "inputs/callsets/t6_7_8.json"
HAPLOID = "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json"

RANGE0 = [(0, 1000000000)]


def check(got, golden_name):
    want = golden(golden_name)
    assert got == want, diff_strings(got, want)


@pytest.mark.parametrize("ranges,name,kw", [
    (RANGE0, "java_t0_1_2_vcf_at_0", {}),
    ([(12150, 1000000000)], "java_t0_1_2_vcf_at_12150", {}),
    ([(p, p) for p in [12000, 12142, 12144, 12160, 12290, 12294, 14000,
                       17384, 18000]],
     "java_t0_1_2_vcf_at_multiple_positions", {}),
    (RANGE0, "java_t0_1_2_vcf_sites_only_at_0", {"sites_only_query": True}),
])
def test_java_t0_1_2(ranges, name, kw):
    check(run_java_vcf(T012, VCF_ATTRIBUTES_ORDER, ranges, **kw), name)


@pytest.mark.parametrize("ranges,name", [
    (RANGE0, "java_t6_7_8_vcf_at_0"),
])
def test_java_t6_7_8_phased(ranges, name):
    check(run_java_vcf(T678, VCF_ATTRIBUTES_ORDER, ranges,
                       vid_file="inputs/vid_phased_GT.json"), name)


@pytest.mark.parametrize("kw,name", [
    ({}, "t0_haploid_triploid_1_2_3_triploid_deletion_java_vcf"),
    ({"produce_GT_field": True},
     "t0_haploid_triploid_1_2_3_triploid_deletion_java_vcf_produce_GT"),
    ({"produce_GT_field": True,
      "produce_GT_with_min_PL_value_for_spanning_deletions": True},
     "t0_haploid_triploid_1_2_3_triploid_deletion_java_vcf_produce_GT_for_min_PL"),
    ({"sites_only_query": True},
     "t0_haploid_triploid_1_2_3_triploid_deletion_java_vcf_sites_only"),
])
def test_java_haploid_triploid(kw, name):
    check(run_java_vcf(HAPLOID, VCF_ATTRIBUTES_ORDER, RANGE0,
                       vid_file="inputs/vid_DS_ID_phased_GT.json", **kw),
          name)
