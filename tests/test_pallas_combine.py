"""Fused Pallas combine kernel vs the XLA path (interpret mode on CPU;
the same kernel compiles on the real chip — see bench.py)."""

import numpy as np
import pytest

from genomicsdb_tpu.ops.combine_step import (block_to_args, combine_step,
                                             synthesize_cohort)
from genomicsdb_tpu.ops import pallas_combine as PC

KEYS = ("pl", "ad", "gt", "gq", "dp_format", "min_dp", "live",
        "info_median", "info_median_ok", "info_imedian",
        "info_imedian_ok", "info_fsum", "info_fsum_ok", "dp_info_sum")


def _compare(ref, out):
    for key in KEYS:
        a, b = np.asarray(ref[key]), np.asarray(out[key])
        assert a.shape == b.shape, (key, a.shape, b.shape)
        if a.dtype.kind == "f":
            np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                          err_msg=key)
            np.testing.assert_array_equal(np.where(np.isnan(a), 0, a),
                                          np.where(np.isnan(b), 0, b),
                                          err_msg=key)
        else:
            np.testing.assert_array_equal(a, b, err_msg=key)


@pytest.mark.parametrize("rt", [1, 8])
def test_fused_matches_xla_synthetic(rt):
    blk = synthesize_cohort(num_samples=8, cells_per_sample=64,
                            region_len=4096, seed=21)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                interpret=True, rt=rt)
    assert out is not None
    _compare(ref, out)


@pytest.mark.parametrize("rt", [1, 8])
def test_fused_rt_odd_sizes(rt):
    """Record counts that are not multiples of rt*128 exercise the
    sublane-packed kernel's padding path."""
    blk = synthesize_cohort(num_samples=5, cells_per_sample=40,
                            region_len=3000, seed=7)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                interpret=True, rt=rt)
    assert out is not None
    _compare(ref, out)


def test_fused_matches_xla_store_block():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from golden_utils import (VCF_ATTRIBUTES_ORDER, load_setup,
                              make_query_params)
    from genomicsdb_tpu.ops.store_block import store_to_block
    from genomicsdb_tpu.query import driver
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    blk = store_to_block(store, qc, interval=(0, 1000000000),
                         max_merged=4, ploidy=2)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                interpret=True)
    assert out is not None
    _compare(ref, out)


def test_fused_writer_golden(monkeypatch):
    """Block writer with the fused path (interpret mode) stays
    golden-exact end-to-end."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from golden_utils import (VCF_ATTRIBUTES_ORDER, golden, run_vcf_block)
    monkeypatch.setenv("GENOMICSDB_TPU_FUSED", "1")
    got = run_vcf_block("inputs/callsets/t0_1_2.json",
                        VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    assert got == golden("t0_1_2_vcf_at_0")


def test_window_plan_rejects_wide_tiles():
    live = np.repeat(np.arange(0, 600 * 3, 3, dtype=np.int32)[:, None],
                     2, axis=1)
    cfg = PC.FusedConfig(g_in=10, g_out=10, a_in=4, m=4, gt_w=2,
                         f_med=1, f_imed=0, f_fsum=0, ploidy=2,
                         gt_phase=False, bt=256, cb=256)
    # 256 records advance 512 cells > window
    assert PC.fused_window_plan(live, cfg) is None
    live2 = np.arange(600, dtype=np.int32)[:, None] // 4
    assert PC.fused_window_plan(live2, cfg) is not None
