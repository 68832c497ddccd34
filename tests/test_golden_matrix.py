"""Golden-output matrix mirroring reference tests/run.py loader_tests."""

import pytest

from golden_utils import (ASA_VCF_ATTRIBUTES, QUERY_ATTRIBUTES_DEFAULT,
                          VCF_ATTRIBUTES_ORDER, diff_strings, golden,
                          run_calls, run_loading, run_variants, run_vcf)

T012 = "inputs/callsets/t0_1_2.json"
T678 = "inputs/callsets/t6_7_8.json"
OVERLAP = "inputs/callsets/t0_overlapping.json"
HAPLOID = "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json"
MINPL = "inputs/callsets/min_PL_spanning_deletion.json"

PL_ONLY = ["PL"]
MLEAC_ONLY = ["MLEAC"]
DS_ID_ATTRS = QUERY_ATTRIBUTES_DEFAULT + ["DS", "ID"]

RANGE0 = [(0, 1000000000)]


def check(got, golden_name):
    want = golden(golden_name)
    assert got == want, diff_strings(got, want)


# ---------------- t0_1_2 ----------------

def test_t0_1_2_loading():
    check(run_loading(T012), "t0_1_2_loading")


@pytest.mark.parametrize("ranges,name", [
    ([(12100, 12100)], "t0_1_2_calls_at_12100"),
    ([(12100, 12100), (12141, 12141)], "t0_1_2_calls_at_12100_12141"),
    ([(12100, 12100), (12141, 12141), (12150, 12150)],
     "t0_1_2_calls_at_12100_12141_12150"),
    ([(12100, 12100), (12141, 12150)], "t0_1_2_calls_at_12100_12141_to_12150"),
    ([(12100, 12100), (12141, 12150), (12300, 12300), (17384, 17384)],
     "t0_1_2_calls_at_12100_12141_to_12150_12300_17384"),
    ([(12150, 1000000000)], "t0_1_2_calls_at_12150"),
    ([(p, p) for p in [12000, 12142, 12144, 12160, 12290, 12294, 14000,
                       17384, 18000]],
     "t0_1_2_calls_at_multiple_positions"),
])
def test_t0_1_2_calls(ranges, name):
    check(run_calls(T012, QUERY_ATTRIBUTES_DEFAULT, ranges), name)


def test_t0_1_2_calls_PL_only():
    check(run_calls(T012, PL_ONLY, RANGE0), "t0_1_2_calls_at_0_with_PL_only")


def test_t0_1_2_variants_12150():
    check(run_variants(T012, QUERY_ATTRIBUTES_DEFAULT, [(12150, 1000000000)]),
          "t0_1_2_variants_at_12150")


def test_t0_1_2_vcf_12150():
    check(run_vcf(T012, VCF_ATTRIBUTES_ORDER, [(12150, 1000000000)]),
          "t0_1_2_vcf_at_12150")


def test_t0_1_2_vcf_multiple_positions():
    ranges = [(p, p) for p in [12000, 12142, 12144, 12160, 12290, 12294,
                               14000, 17384, 18000]]
    check(run_vcf(T012, VCF_ATTRIBUTES_ORDER, ranges),
          "t0_1_2_vcf_at_multiple_positions")


def test_t0_1_2_vcf_sites_only():
    check(run_vcf(T012, VCF_ATTRIBUTES_ORDER, RANGE0, sites_only_query=True),
          "t0_1_2_vcf_sites_only_at_0")


def test_t0_1_2_vcf_FILTER():
    check(run_vcf(T012, VCF_ATTRIBUTES_ORDER, RANGE0,
                  produce_FILTER_field=True), "t0_1_2_vcf_at_0_with_FILTER")


# ---------------- phased GT vid (java_t0_1_2 config) ----------------

def test_t0_1_2_phased_calls_at_0():
    check(run_calls(T012, QUERY_ATTRIBUTES_DEFAULT, RANGE0,
                    vid_file="inputs/vid_phased_GT.json"),
          "t0_1_2_calls_at_0_phased_GT")


def test_t0_1_2_phased_calls_at_12150():
    check(run_calls(T012, QUERY_ATTRIBUTES_DEFAULT, [(12150, 1000000000)],
                    vid_file="inputs/vid_phased_GT.json"),
          "t0_1_2_calls_at_12150_phased_GT")


def test_t0_1_2_phased_variants_at_0():
    check(run_variants(T012, QUERY_ATTRIBUTES_DEFAULT, RANGE0,
                       vid_file="inputs/vid_phased_GT.json"),
          "t0_1_2_variants_at_0_phased_GT")


def test_t0_1_2_phased_vcf_at_0():
    check(run_vcf(T012, VCF_ATTRIBUTES_ORDER, RANGE0,
                  vid_file="inputs/vid_phased_GT.json"), "t0_1_2_vcf_at_0")


# ---------------- t0_overlapping ----------------

def test_t0_overlapping_loading():
    check(run_loading(OVERLAP), "t0_overlapping")


def test_t0_overlapping_vcf_at_12202():
    check(run_vcf(OVERLAP, VCF_ATTRIBUTES_ORDER, [(12202, 1000000000)]),
          "t0_overlapping_at_12202")


def test_t0_overlapping_loading_partition_12202():
    check(run_loading(OVERLAP, column_partition=(12202, None)),
          "t0_overlapping_at_12202")


# ---------------- t6_7_8 ----------------

def test_t6_7_8_loading():
    check(run_loading(T678), "t6_7_8_loading")


@pytest.mark.parametrize("ranges,name", [
    (RANGE0, "t6_7_8_calls_at_0"),
    ([(8029500, 1000000000)], "t6_7_8_calls_at_8029500"),
])
def test_t6_7_8_calls(ranges, name):
    check(run_calls(T678, QUERY_ATTRIBUTES_DEFAULT, ranges), name)


@pytest.mark.parametrize("ranges,name", [
    (RANGE0, "t6_7_8_variants_at_0"),
    ([(8029500, 1000000000)], "t6_7_8_variants_at_8029500"),
])
def test_t6_7_8_variants(ranges, name):
    check(run_variants(T678, QUERY_ATTRIBUTES_DEFAULT, ranges), name)


@pytest.mark.parametrize("ranges,name,kw", [
    (RANGE0, "t6_7_8_vcf_at_0", {}),
    ([(8029500, 1000000000)], "t6_7_8_vcf_at_8029500", {}),
    ([(8029500, 8029500)], "t6_7_8_vcf_at_8029500-8029500", {}),
    (RANGE0, "t6_7_8_vcf_sites_only_at_0", {"sites_only_query": True}),
])
def test_t6_7_8_vcf(ranges, name, kw):
    check(run_vcf(T678, VCF_ATTRIBUTES_ORDER, ranges, **kw), name)


def test_t6_7_8_phased_calls_at_0():
    check(run_calls(T678, QUERY_ATTRIBUTES_DEFAULT, RANGE0,
                    vid_file="inputs/vid_phased_GT.json"),
          "t6_7_8_calls_at_0_phased_GT")


def test_t6_7_8_phased_variants_at_8029500():
    check(run_variants(T678, QUERY_ATTRIBUTES_DEFAULT,
                       [(8029500, 1000000000)],
                       vid_file="inputs/vid_phased_GT.json"),
          "t6_7_8_variants_at_8029500_phased_GT")


# ---------------- special vids ----------------

def test_new_fields_MLEAC_only_calls():
    check(run_calls(T678, MLEAC_ONLY, RANGE0,
                    vid_file="inputs/vid_MLEAC_MLEAF.json"),
          "test_new_fields_MLEAC_only.json")


def test_info_ops0_loading():
    check(run_loading("inputs/callsets/info_ops.json",
                      vid_file="inputs/vid_info_ops0.json"), "info_ops0.vcf")


def test_info_ops1_loading():
    check(run_loading("inputs/callsets/info_ops.json",
                      vid_file="inputs/vid_info_ops1.json"), "info_ops1.vcf")


def test_t0_1_2_combined_vcf():
    check(run_vcf("inputs/callsets/t0_1_2_combined.json",
                  VCF_ATTRIBUTES_ORDER, RANGE0), "t0_1_2_combined")


def test_flag_field_DS_ID_calls():
    check(run_calls(T012, DS_ID_ATTRS, RANGE0,
                    vid_file="inputs/vid_DS_ID.json"),
          "t0_1_2_DS_ID_calls_at_0")


def test_flag_field_DS_ID_variants():
    check(run_variants(T012, DS_ID_ATTRS, RANGE0,
                       vid_file="inputs/vid_DS_ID.json"),
          "t0_1_2_DS_ID_variants_at_0")


def test_missing_PL_SB_loading():
    check(run_loading("inputs/callsets/t0_with_missing_PL_SB_fields_t1.json"),
          "t0_with_missing_PL_SB_fields_t1.vcf")


def test_missing_PL_SB_calls():
    check(run_calls("inputs/callsets/t0_with_missing_PL_SB_fields_t1.json",
                    QUERY_ATTRIBUTES_DEFAULT, RANGE0),
          "t0_with_missing_PL_SB_fields_t1_calls.json")


# ---------------- haploid / triploid ----------------

def test_haploid_triploid_loading():
    check(run_loading(HAPLOID, vid_file="inputs/vid_DS_ID_phased_GT.json"),
          "t0_haploid_triploid_1_2_3_triploid_deletion_loading")


@pytest.mark.parametrize("kw,name", [
    ({}, "t0_haploid_triploid_1_2_3_triploid_deletion_vcf"),
    ({"produce_GT_field": True},
     "t0_haploid_triploid_1_2_3_triploid_deletion_vcf_produce_GT"),
    ({"produce_GT_field": True,
      "produce_GT_with_min_PL_value_for_spanning_deletions": True},
     "t0_haploid_triploid_1_2_3_triploid_deletion_vcf_produce_GT_for_min_value_PL"),
    ({"sites_only_query": True},
     "t0_haploid_triploid_1_2_3_triploid_deletion_vcf_sites_only"),
])
def test_haploid_triploid_vcf(kw, name):
    check(run_vcf(HAPLOID, VCF_ATTRIBUTES_ORDER, RANGE0,
                  vid_file="inputs/vid_DS_ID_phased_GT.json", **kw), name)


# ---------------- allele-specific annotations ----------------

def test_all_asa_vcf():
    check(run_vcf("inputs/callsets/t0_1_2_all_asa.json", ASA_VCF_ATTRIBUTES,
                  RANGE0, vid_file="inputs/vid_all_asa.json"),
          "t0_1_2_all_asa_loading")


# ---------------- min PL spanning deletion ----------------

def test_min_PL_loading():
    check(run_loading(MINPL, vid_file="inputs/vid_phased_GT.json"),
          "min_PL_spanning_deletion_load_stdout")


def test_min_PL_vcf_no_min_PL():
    check(run_vcf(MINPL, VCF_ATTRIBUTES_ORDER, RANGE0,
                  vid_file="inputs/vid_phased_GT.json",
                  produce_GT_field=True),
          "min_PL_spanning_deletion_vcf_no_min_PL")


def test_min_PL_vcf():
    check(run_vcf(MINPL, VCF_ATTRIBUTES_ORDER, RANGE0,
                  vid_file="inputs/vid_phased_GT.json",
                  produce_GT_field=True,
                  produce_GT_with_min_PL_value_for_spanning_deletions=True),
          "min_PL_spanning_deletion_vcf")
