"""Pallas fused remap kernel == XLA remap (interpret mode on CPU)."""

import numpy as np

from genomicsdb_tpu.core import formats
from genomicsdb_tpu.ops import jax_kernels as K
from genomicsdb_tpu.ops.pallas_remap import remap_genotype_fields_pallas


def test_pallas_remap_matches_xla():
    rng = np.random.default_rng(5)
    R, S = 12, 8
    max_merged, ploidy = 4, 2
    Gin = 10
    values = rng.integers(0, 1000, size=(R, S, Gin)).astype(np.int32)
    inv = np.full((R, S, max_merged), -1, dtype=np.int32)
    inv[..., 0] = 0
    inv[..., 1] = rng.integers(-1, 3, size=(R, S))
    inv[..., 3] = rng.integers(0, 3, size=(R, S))
    in_len = rng.integers(1, Gin + 1, size=(R, S)).astype(np.int32)
    input_nr = rng.integers(-1, 3, size=(R, S)).astype(np.int32)
    num_merged = np.full(R, max_merged, dtype=np.int32)
    want = np.asarray(K.remap_genotype_fields(
        values, inv, in_len, input_nr, num_merged,
        num_merged_alleles=max_merged, ploidy=ploidy))
    got = np.asarray(remap_genotype_fields_pallas(
        values, inv, in_len, input_nr, num_merged,
        num_merged_alleles=max_merged, ploidy=ploidy, interpret=True))
    np.testing.assert_array_equal(got, want)
