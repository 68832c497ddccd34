"""GENOMICSDB_TPU_DENSE=1 (host pre-gather + dense device math) must be
byte-exact too — it is the production PCIe-host configuration.  The
env switch is read inside render_block_vcf, so monkeypatching the
environment per test exercises the real dispatch."""

import pytest

from golden_utils import (VCF_ATTRIBUTES_ORDER, diff_strings, golden,
                          run_vcf_block)

RANGE0 = [(0, 1000000000)]


@pytest.fixture(autouse=True)
def dense_env(monkeypatch):
    monkeypatch.setenv("GENOMICSDB_TPU_DENSE", "1")


@pytest.mark.parametrize("callset,vidf,name,kw", [
    ("inputs/callsets/t0_1_2.json", "inputs/vid.json",
     "t0_1_2_vcf_at_0", {}),
    ("inputs/callsets/t6_7_8.json", "inputs/vid.json",
     "t6_7_8_vcf_at_0", {}),
    ("inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json",
     "inputs/vid_DS_ID_phased_GT.json",
     "t0_haploid_triploid_1_2_3_triploid_deletion_vcf", {}),
    ("inputs/callsets/min_PL_spanning_deletion.json",
     "inputs/vid_phased_GT.json", "min_PL_spanning_deletion_vcf",
     {"produce_GT_field": True,
      "produce_GT_with_min_PL_value_for_spanning_deletions": True}),
])
def test_dense_golden(callset, vidf, name, kw):
    got = run_vcf_block(callset, VCF_ATTRIBUTES_ORDER, RANGE0,
                        vid_file=vidf, **kw)
    want = golden(name)
    assert got == want, diff_strings(got, want)
