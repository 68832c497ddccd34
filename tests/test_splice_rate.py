"""Block-path coverage contract: on the golden corpus with the default
attribute list (which includes SB, PGT, PID), the batched engine must
render every record itself — no sequential splice.  General-ploidy
cohorts (haploid/triploid) also run batched: the block is sized to the
cohort max ploidy and per-call GT lengths drive the remap select."""

import numpy as np
import pytest

from golden_utils import (ASA_VCF_ATTRIBUTES, VCF_ATTRIBUTES_ORDER,
                          load_setup, make_query_params)

from genomicsdb_tpu.ops.store_block import store_to_block
from genomicsdb_tpu.query import driver


def splice_stats(callset, vidf, attrs, **kw):
    vid, store = load_setup(callset, vidf)
    qp = make_query_params(attrs, [(0, 1000000000)], **kw)
    qc = driver.make_query_config(qp, vid)
    blk, meta = store_to_block(store, qc, interval=(0, 1000000000),
                               max_merged=4, ploidy=2, return_meta=True)
    live_any = (blk.live >= 0).any(axis=1)
    n = int(live_any.sum())
    spliced = int((meta.needs_fallback & live_any).sum())
    return n, spliced


@pytest.mark.parametrize("callset,vidf,attrs,kw", [
    ("inputs/callsets/t0_1_2.json", "inputs/vid.json",
     VCF_ATTRIBUTES_ORDER, {}),
    ("inputs/callsets/t6_7_8.json", "inputs/vid.json",
     VCF_ATTRIBUTES_ORDER, {}),
    ("inputs/callsets/t0_overlapping.json", "inputs/vid.json",
     VCF_ATTRIBUTES_ORDER, {}),
    ("inputs/callsets/min_PL_spanning_deletion.json",
     "inputs/vid_phased_GT.json", VCF_ATTRIBUTES_ORDER,
     {"produce_GT_field": True,
      "produce_GT_with_min_PL_value_for_spanning_deletions": True}),
    ("inputs/callsets/t0_1_2_all_asa.json", "inputs/vid_all_asa.json",
     ASA_VCF_ATTRIBUTES, {}),
    ("inputs/callsets/t0_1_2.json", "inputs/vid_phased_GT.json",
     VCF_ATTRIBUTES_ORDER, {}),
])
def test_zero_splice(callset, vidf, attrs, kw):
    n, spliced = splice_stats(callset, vidf, attrs, **kw)
    assert n > 0
    assert spliced == 0, f"{spliced}/{n} records spliced"


def test_general_ploidy_runs_batched():
    # haploid/triploid cohorts: per-call GT lengths vary — the block is
    # sized to the cohort max ploidy, per-call ploidy selects the
    # genotype enumeration, and nothing splices (byte-exactness is
    # asserted by test_block_golden_matrix::test_block_haploid_triploid)
    n, spliced = splice_stats(
        "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json",
        "inputs/vid_DS_ID_phased_GT.json", VCF_ATTRIBUTES_ORDER)
    assert n > 0
    assert spliced == 0, f"{spliced}/{n} records spliced"
