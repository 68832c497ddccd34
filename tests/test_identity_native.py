"""Native gdb_identity_outputs == the numpy host_identity_outputs.

The ref-block identity passthrough (combine_step.host_identity_outputs,
the host half of the variant-row-only device fetch — reference
semantics: broad_combined_gvcf.cc handle_* on pure reference blocks)
has a threaded C++ form (runtime/native/vcf_kernels.cpp
gdb_identity_outputs).  Fuzz both over mixed/phased/ploidy/width
configurations and require exact equality; byte-level end-to-end
equality is separately pinned by the golden suites with
GENOMICSDB_TPU_PACK=1.
"""

import numpy as np
import pytest

from genomicsdb_tpu.ops import combine_step as CS
from genomicsdb_tpu.runtime import native_loader


@pytest.mark.skipif(native_loader.get_lib() is None,
                    reason="native library unavailable")
def test_identity_outputs_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(7)
    for trial in range(40):
        S = int(rng.integers(1, 12))
        C = int(rng.integers(1, 40))
        B = int(rng.integers(0, 50))
        mixed = bool(rng.integers(0, 2))
        phase = bool(rng.integers(0, 2))
        ploidy = int(rng.integers(1, 4))
        wgt = 2 * ploidy - 1 if phase else ploidy

        class Blk:
            pass

        blk = Blk()
        blk.live = rng.integers(-1, C, size=(B, S)).astype(np.int32)
        blk.col = np.zeros((S, C), np.int64)
        blk.pl = rng.integers(-2**31, 500, size=(
            S, C, int(rng.integers(1, 12)))).astype(np.int32)
        blk.pl_len = rng.integers(
            0, blk.pl.shape[2] + 1, size=(S, C)).astype(np.int32)
        blk.ad = rng.integers(-5, 50, size=(
            S, C, int(rng.integers(1, 6)))).astype(np.int32)
        blk.ad_len = rng.integers(
            0, blk.ad.shape[2] + 1, size=(S, C)).astype(np.int32)
        blk.gt = rng.integers(-1, 4, size=(S, C, wgt)).astype(np.int32)
        blk.gt[rng.random((S, C, wgt)) < .1] = CS.INT_MISSING
        blk.gq = rng.integers(-2**31, 99, size=(S, C)).astype(np.int32)
        blk.dp = rng.integers(0, 99, size=(S, C)).astype(np.int32)
        blk.min_dp = rng.integers(0, 99, size=(S, C)).astype(np.int32)
        blk.gt_len_bs = rng.integers(
            0, wgt + 1, size=(B, S)).astype(np.int32) if mixed else None
        blk.ploidy = ploidy
        rows = np.arange(B)
        widths = (int(rng.integers(1, 12)), int(rng.integers(2, 6)),
                  wgt)
        with monkeypatch.context() as m:
            m.setattr(native_loader, "identity_outputs",
                      lambda *a, **k: None)
            ref = CS.host_identity_outputs(blk, rows, widths, phase,
                                           mixed)
        nat = CS.host_identity_outputs(blk, rows, widths, phase, mixed)
        for k in ref:
            assert np.array_equal(ref[k], nat[k]), (trial, k, mixed,
                                                    phase, ploidy)
