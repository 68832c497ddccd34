"""End-to-end device combine step vs the numpy semantics oracle."""

import numpy as np

from genomicsdb_tpu.core import formats
from genomicsdb_tpu.ops import merge as M
from genomicsdb_tpu.ops.combine_step import (block_to_args, combine_step,
                                             synthesize_cohort)

INT_MISSING = formats.INT_MISSING


def test_combine_step_matches_oracle():
    blk = synthesize_cohort(num_samples=8, cells_per_sample=32,
                            region_len=1024, seed=7)
    out = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    live = np.asarray(out["live"])
    pl_out = np.asarray(out["pl"])
    ad_out = np.asarray(out["ad"])
    gt_out = np.asarray(out["gt"])
    med = np.asarray(out["info_median"])
    med_ok = np.asarray(out["info_median_ok"])
    dp_sum = np.asarray(out["dp_info_sum"])
    B, S = live.shape
    for b in range(B):
        nm = int(blk.rec_num_merged[b])
        st = int(blk.starts[b])
        dp_expect = 0
        for s in range(S):
            # oracle live cell: last cell with col <= start, end >= start
            cols = blk.col[s]
            idx = np.searchsorted(cols, st, side="right") - 1
            exp_live = -1
            if idx >= 0 and blk.end[s, idx] >= st:
                exp_live = idx
            assert live[b, s] == exp_live, (b, s)
            if exp_live < 0:
                assert np.all(pl_out[b, s] == INT_MISSING)
                continue
            c = exp_live
            # build lut row from inv_bs: merged->input; oracle wants
            # input->merged
            inv = blk.inv_bs[b, s]
            n_in = int((inv >= 0).sum())
            lut_row = np.full(n_in, M.LUT_MISSING, dtype=np.int32)
            for m_i, in_a in enumerate(inv[:nm]):
                if 0 <= in_a < n_in:
                    lut_row[in_a] = m_i
            non_ref = blk.nr_bs[b, s] >= 0
            exp_pl = M.remap_by_genotype(
                blk.pl[s, c, :blk.pl_len[s, c]], lut_row, nm, non_ref, 2,
                INT_MISSING)
            np.testing.assert_array_equal(pl_out[b, s, :len(exp_pl)],
                                          exp_pl, err_msg=f"PL b={b} s={s}")
            exp_ad = M.remap_by_alleles(
                blk.ad[s, c, :blk.ad_len[s, c]], lut_row, nm, non_ref,
                False, INT_MISSING)
            np.testing.assert_array_equal(ad_out[b, s, :len(exp_ad)],
                                          exp_ad, err_msg=f"AD b={b} s={s}")
            exp_gt = M.remap_gt_field(blk.gt[s, c], lut_row, nm, non_ref,
                                      contains_phase=False)
            np.testing.assert_array_equal(gt_out[b, s], exp_gt,
                                          err_msg=f"GT b={b} s={s}")
            # DP logic
            dpi = int(blk.dp_info[s, c])
            if dpi == INT_MISSING:
                if int(blk.min_dp[s, c]) != INT_MISSING:
                    dpi = int(blk.min_dp[s, c])
                else:
                    dpi = int(blk.dp[s, c])
            if dpi != INT_MISSING:
                dp_expect += dpi
        assert dp_sum[b] == dp_expect, b
    # medians
    F = blk.info_f.shape[0]
    for f in range(F):
        for b in range(min(B, 64)):
            vals = []
            for s in range(S):
                if live[b, s] >= 0:
                    x = blk.info_f[f, s, live[b, s]]
                    if np.isfinite(x):
                        vals.append(float(x))
            if not vals:
                assert not med_ok[f, b]
            else:
                assert med_ok[f, b]
                assert med[f, b] == sorted(vals)[len(vals) // 2]


def test_combine_step_dense_matches():
    """Host pre-gather + combine_step_dense == combine_step outputs."""
    import numpy as np
    from genomicsdb_tpu.ops.combine_step import (
        block_to_args, combine_step, combine_step_dense,
        gather_block_host, live_cells_at_host, synthesize_cohort)
    blk = synthesize_cohort(num_samples=8, cells_per_sample=32,
                            region_len=2048, seed=3)
    live = live_cells_at_host(blk.starts, blk.col, blk.end)
    blk.live = live
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    g = gather_block_host(blk, live)
    out = combine_step_dense(
        g["plg"], g["invg"], g["pllg"], g["nrg"], g["adg"], g["adlg"],
        g["gtg"], g["gqg"], g["dpfg"], g["mdpg"], g["dpig"], g["infog"],
        g["infoig"], g["infofsg"], g["valid"], blk.rec_num_merged,
        max_merged=4, ploidy=2)
    for key in ("pl", "ad", "gt", "dp_info_sum", "gq", "dp_format",
                "min_dp", "info_fsum", "info_imedian", "info_median"):
        a, b = np.asarray(ref[key]), np.asarray(out[key])
        if a.dtype.kind == "f":
            assert np.allclose(a, b, equal_nan=True), key
        else:
            assert np.array_equal(a, b), key
