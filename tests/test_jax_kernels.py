"""JAX batched kernels vs the numpy semantics oracle (ops/merge.py)."""

import numpy as np
import pytest

from genomicsdb_tpu.core import formats
from genomicsdb_tpu.ops import merge as M
from genomicsdb_tpu.ops import jax_kernels as K

INT_MISSING = formats.INT_MISSING


def random_lut(rng, num_in_alleles, num_merged):
    """Random plausible allele LUT row: REF->REF, random injective-ish map."""
    lut = np.full(num_in_alleles, M.LUT_MISSING, dtype=np.int32)
    lut[0] = 0
    merged = list(range(1, num_merged))
    rng.shuffle(merged)
    for i in range(1, num_in_alleles):
        if merged and rng.random() < 0.8:
            lut[i] = merged.pop()
    return lut


@pytest.mark.parametrize("ploidy", [1, 2, 3])
def test_remap_genotype_matches_oracle(ploidy):
    rng = np.random.default_rng(0)
    R, S = 6, 5
    num_merged_alleles = 4
    Gmax = M.genotype_combinations(num_merged_alleles, ploidy)
    G = len(Gmax)
    Gin = 16
    values = rng.integers(0, 1000, size=(R, S, Gin)).astype(np.int32)
    inv = np.full((R, S, num_merged_alleles), M.LUT_MISSING, dtype=np.int32)
    in_len = np.zeros((R, S), dtype=np.int32)
    input_nr = np.full((R, S), -1, dtype=np.int32)
    num_merged = rng.integers(2, num_merged_alleles + 1, size=R
                              ).astype(np.int32)
    luts = {}
    for r in range(R):
        for s in range(S):
            n_in = int(rng.integers(2, 5))
            lut = random_lut(rng, n_in, int(num_merged[r]))
            non_ref = int(rng.integers(0, 2))
            if non_ref and num_merged[r] >= 2:
                # last merged allele is NON_REF mapped from last input
                lut[n_in - 1] = num_merged[r] - 1
            luts[(r, s)] = (lut, n_in, bool(non_ref))
            invr = M.inverse_lut(lut, int(num_merged[r]))
            inv[r, s, :num_merged[r]] = invr
            in_len[r, s] = int(rng.integers(1, Gin))
            if non_ref:
                input_nr[r, s] = invr[num_merged[r] - 1]
    out = np.asarray(K.remap_genotype_fields(
        values, inv, in_len, input_nr, num_merged,
        num_merged_alleles=num_merged_alleles, ploidy=ploidy))
    for r in range(R):
        for s in range(S):
            lut, n_in, non_ref = luts[(r, s)]
            expected = M.remap_by_genotype(
                values[r, s, :in_len[r, s]], lut, int(num_merged[r]),
                input_nr[r, s] >= 0, ploidy, INT_MISSING)
            got = out[r, s, :len(expected)]
            np.testing.assert_array_equal(got, expected,
                                          err_msg=f"r={r} s={s}")
            # padding beyond the record's genotype count is missing
            assert np.all(out[r, s, len(expected):] == INT_MISSING)


@pytest.mark.parametrize("alt_only", [False, True])
def test_remap_alleles_matches_oracle(alt_only):
    rng = np.random.default_rng(1)
    R, S = 5, 4
    Mmax = 5
    K_in = 8
    values = rng.integers(0, 100, size=(R, S, K_in)).astype(np.int32)
    inv = np.full((R, S, Mmax), M.LUT_MISSING, dtype=np.int32)
    in_len = np.zeros((R, S), dtype=np.int32)
    input_nr = np.full((R, S), -1, dtype=np.int32)
    num_merged = rng.integers(2, Mmax + 1, size=R).astype(np.int32)
    luts = {}
    for r in range(R):
        for s in range(S):
            n_in = int(rng.integers(2, 5))
            lut = random_lut(rng, n_in, int(num_merged[r]))
            non_ref = bool(rng.integers(0, 2)) and num_merged[r] >= 2
            if non_ref:
                lut[n_in - 1] = num_merged[r] - 1
            luts[(r, s)] = (lut, n_in, non_ref)
            invr = M.inverse_lut(lut, int(num_merged[r]))
            inv[r, s, :num_merged[r]] = invr
            in_len[r, s] = int(rng.integers(1, K_in))
            if non_ref:
                input_nr[r, s] = invr[num_merged[r] - 1]
    out = np.asarray(K.remap_allele_fields(values, inv, in_len, input_nr,
                                           num_merged, alt_only))
    for r in range(R):
        for s in range(S):
            lut, n_in, non_ref = luts[(r, s)]
            expected = M.remap_by_alleles(
                values[r, s, :in_len[r, s]], lut, int(num_merged[r]),
                input_nr[r, s] >= 0, alt_only, INT_MISSING)
            got = out[r, s, :len(expected)]
            np.testing.assert_array_equal(got, expected,
                                          err_msg=f"r={r} s={s}")


def test_masked_median_matches_reference_semantics():
    rng = np.random.default_rng(2)
    R, S = 32, 9
    vals = rng.integers(-50, 50, size=(R, S)).astype(np.int32)
    valid = rng.random((R, S)) < 0.7
    med, any_valid = K.masked_median_int(vals, valid)
    med, any_valid = np.asarray(med), np.asarray(any_valid)
    for r in range(R):
        vv = sorted(int(v) for v, ok in zip(vals[r], valid[r]) if ok)
        if not vv:
            assert not any_valid[r]
        else:
            assert any_valid[r]
            assert med[r] == vv[len(vv) // 2]


def test_live_cells_at():
    # two rows with interval cells
    col = np.array([[0, 10, 20], [5, 15, 2**62]], dtype=np.int64)
    end = np.array([[9, 14, 29], [9, 24, 0]], dtype=np.int64)
    starts = np.array([0, 5, 10, 15, 25], dtype=np.int64)
    out = np.asarray(K.live_cells_at(starts, col, end))
    expected = np.array([
        [0, -1], [0, 0], [1, -1], [-1, 1], [2, -1]])
    np.testing.assert_array_equal(out, expected)
