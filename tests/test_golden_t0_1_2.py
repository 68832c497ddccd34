"""Golden tests for the t0_1_2 loader config (reference tests/run.py:184)."""

import pytest

from golden_utils import (ASA_VCF_ATTRIBUTES, QUERY_ATTRIBUTES_DEFAULT,
                          VCF_ATTRIBUTES_ORDER, diff_strings, golden,
                          run_calls, run_variants, run_vcf)

CALLSET = "inputs/callsets/t0_1_2.json"


def check(got, golden_name):
    want = golden(golden_name)
    assert got == want, diff_strings(got, want)


def test_calls_at_0():
    got = run_calls(CALLSET, QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    check(got, "t0_1_2_calls_at_0")


def test_vcf_at_0():
    got = run_vcf(CALLSET, VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    check(got, "t0_1_2_vcf_at_0")


def test_variants_at_0():
    got = run_variants(CALLSET, QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    check(got, "t0_1_2_variants_at_0")
