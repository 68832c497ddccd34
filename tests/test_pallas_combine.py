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


@pytest.mark.parametrize("ploidy", [3, 5, 6])
def test_fused_high_ploidy(ploidy):
    """Ploidy 5-6 run fused (general closed-form genotype-index terms)
    and match the XLA path — round 3 statically refused ploidy > 4."""
    blk = synthesize_cohort(num_samples=4, cells_per_sample=48,
                            region_len=4096, seed=11, ploidy=ploidy)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=ploidy)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=ploidy,
                                interpret=True)
    assert out is not None
    _compare(ref, out)


@pytest.mark.parametrize("pmax", [3, 6])
def test_fused_mixed_high_ploidy(pmax):
    """Per-call ploidy up to 6 through the mixed fused kernel."""
    blk = synthesize_cohort(num_samples=4, cells_per_sample=48,
                            region_len=4096, seed=13, ploidy=pmax)
    B, S = np.asarray(blk.live).shape
    rng = np.random.default_rng(3)
    blk.gt_len_bs = rng.integers(1, pmax + 1,
                                 size=(B, S)).astype(np.int32)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=pmax,
                       mixed_ploidy=True)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=pmax,
                                interpret=True, mixed_ploidy=True)
    assert out is not None
    _compare(ref, out)


def _widen16(a):
    from genomicsdb_tpu.core import formats
    a = np.asarray(a)
    w = a.astype(np.int32)
    w[a == -32768] = formats.INT_MISSING
    w[a == -32767] = formats.INT_VECTOR_END
    return w


@pytest.mark.parametrize("mixed", [False, True])
def test_fused_narrow_outputs(mixed):
    """narrow_out=True makes the kernel emit PL/AD/GT as int16 with the
    BCF16 sentinels; widened they must equal the int32 path exactly."""
    blk = synthesize_cohort(num_samples=6, cells_per_sample=48,
                            region_len=4096, seed=21)
    if mixed:
        B, S = np.asarray(blk.live).shape
        rng = np.random.default_rng(5)
        blk.gt_len_bs = rng.integers(1, 3, size=(B, S)).astype(np.int32)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2,
                       mixed_ploidy=mixed)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                interpret=True, mixed_ploidy=mixed,
                                narrow_out=True)
    assert out is not None
    # GQ/DP/MIN_DP also come back kernel-narrowed when the payload
    # ranges allow it (narrow_scalars; this synthetic cohort qualifies)
    for k in ("pl", "ad", "gt", "gq", "dp_format", "min_dp"):
        got = np.asarray(out[k])
        assert got.dtype == np.int16, (k, got.dtype)
        np.testing.assert_array_equal(_widen16(got), np.asarray(ref[k]),
                                      err_msg=k)
    for k in ("dp_info_sum", "live"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]), err_msg=k)


def test_fused_narrow_pack_fetch_roundtrip():
    """The blob pack/fetch of kernel-narrowed outputs reproduces the
    int32 host arrays bit-exactly (pre-narrowed pass-through + the
    int16->int8 GT re-narrow)."""
    from genomicsdb_tpu.ops.combine_step import fetch_outputs, pack_outputs
    blk = synthesize_cohort(num_samples=6, cells_per_sample=48,
                            region_len=4096, seed=9)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                interpret=True, narrow_out=True)
    assert out is not None
    packed = pack_outputs(out)
    assert packed is not None
    got = fetch_outputs(out, packed)
    for k in ("pl", "ad", "gt", "gq", "dp_format", "min_dp"):
        np.testing.assert_array_equal(got[k], np.asarray(ref[k]),
                                      err_msg=k)


def test_narrow_inputs_check_rejects_wide_values():
    blk = synthesize_cohort(num_samples=4, cells_per_sample=40,
                            region_len=3000, seed=7)
    assert PC._narrow_inputs_ok(blk)
    blk.pl = blk.pl.copy()
    blk.pl[0, 0, 0] = 100_000          # genuine int16 overflow
    if getattr(blk, "_dense_layout", None) is not None:
        blk._dense_layout.pop("_narrow_ok", None)
    assert not PC._narrow_inputs_ok(blk)
    out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                interpret=True, narrow_out=True)
    # falls back to wide outputs, not a wrong narrow result
    assert out is not None and np.asarray(out["pl"]).dtype == np.int32


def test_vmem_estimate_rejects_round3_oom_config():
    """The config that OOMed Mosaic's 16M scoped-VMEM limit on the chip
    in round 3 (mixed triploid, m=8, V=54, Vout=144, auto-tried rt=32;
    VERDICT r3 item 1) must be rejected by the estimator, while its
    rt=8 form must fit."""
    bad = PC.FusedConfig(g_in=36, g_out=120, a_in=8, m=8, gt_w=5,
                         f_med=6, f_imed=1, f_fsum=1, ploidy=3,
                         gt_phase=True, rt=32, mixed=True)
    assert PC.scoped_vmem_estimate(bad) > PC._vmem_budget_bytes()
    import dataclasses
    ok = dataclasses.replace(bad, rt=8)
    assert PC.scoped_vmem_estimate(ok) <= PC._vmem_budget_bytes()


def test_fused_config_failure_degrades(monkeypatch):
    """A kernel that fails to compile/execute must degrade to the next
    rt candidate — and the failed config must be remembered so later
    queries skip it without re-paying the failed compile."""
    blk = synthesize_cohort(num_samples=4, cells_per_sample=40,
                            region_len=3000, seed=7)
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    monkeypatch.setattr(PC, "_CFG_STATUS", {})
    real = PC.fused_gather_remap_rt
    calls = []

    def flaky(*args, cfg, interpret=False):
        calls.append(cfg.rt)
        if cfg.rt > 8:
            raise RuntimeError("synthetic compile failure")
        # run the real kernel in interpret mode (CPU test process)
        return real(*args, cfg=cfg, interpret=True)

    monkeypatch.setattr(PC, "fused_gather_remap_rt", flaky)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                    interpret=False)
    assert out is not None
    _compare(ref, out)
    assert calls[0] > 8 and calls[-1] == 8, calls
    # second query: the bad config is skipped without another attempt
    n_first = len(calls)
    out2 = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                 interpret=False)
    assert out2 is not None
    assert len(calls) == n_first + 1 and calls[-1] == 8, calls


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
