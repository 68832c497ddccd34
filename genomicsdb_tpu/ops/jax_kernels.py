"""Batched JAX/XLA kernels for the combine pipeline (the TPU compute path).

The sequential oracle in ops/merge.py processes one call at a time (as the
reference C++ does).  These kernels process a whole block of records at once
with static shapes:

  R = records (aligned sub-intervals) per block
  S = samples (rows)
  M = max merged alleles (padded)
  G = max genotypes     (padded)

Semantics mirror variant_field_handler.cc:42-420 (remaps) and
:530-700 (combine reductions); validated against ops/merge.py in
tests/test_jax_kernels.py.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import formats
from . import merge as M

INT_MISSING = formats.INT_MISSING
LUT_MISSING = -1


# ---------------- host-side tables (cached) ----------------

@lru_cache(maxsize=64)
def genotype_combo_table(num_alleles: int, ploidy: int) -> np.ndarray:
    """[G, ploidy] int32: allele indices (ascending) of genotype g, in
    canonical VCF enumeration order."""
    combos = M.genotype_combinations(num_alleles, ploidy)
    return np.asarray(combos, dtype=np.int32).reshape(len(combos), ploidy)


@lru_cache(maxsize=8)
def ncr_table(n_max: int) -> np.ndarray:
    """[n_max+1, n_max+2] nCr with the r=-1 column folded in at index 0:
    table[n, r+1] = C(n, r), table[n, 0] = 0."""
    t = np.zeros((n_max + 1, n_max + 2), dtype=np.int32)
    for n in range(n_max + 1):
        for r in range(n + 1):
            t[n, r + 1] = M._ncr(n, r)
    return t


# ---------------- device kernels ----------------

def _sorting_network(vals):
    """Ascending sort of a static-length list of equal-shape arrays
    (keeps the ploidy axis OUT of the tensors: each element is [R, S, G])."""
    vals = list(vals)
    n = len(vals)
    for i in range(n):
        for j in range(0, n - i - 1):
            lo = jnp.minimum(vals[j], vals[j + 1])
            hi = jnp.maximum(vals[j], vals[j + 1])
            vals[j], vals[j + 1] = lo, hi
    return vals


@partial(jax.jit, static_argnames=("num_merged_alleles", "ploidy"))
def remap_genotype_fields(values: jnp.ndarray, inv_lut: jnp.ndarray,
                          in_len: jnp.ndarray, input_nr: jnp.ndarray,
                          num_merged: jnp.ndarray,
                          num_merged_alleles: int, ploidy: int
                          ) -> jnp.ndarray:
    """Batched G-length remap (PL reorder).

    values:   [R, S, Gin]  int32, padded with INT_MISSING
    inv_lut:  [R, S, M]    merged-allele -> input-allele (-1 = absent)
    in_len:   [R, S]       #valid elements of `values` per call
    input_nr: [R, S]       input NON_REF allele idx (-1 = none)
    num_merged: [R]        actual #merged alleles per record
    Returns [R, S, G] remapped, INT_MISSING where no mapping.

    TPU note: the ploidy axis is unrolled statically (a [.., G, P] tensor
    with P minor would be lane-padded ~64x); per-slot tensors stay [R,S,G].
    """
    combos = genotype_combo_table(num_merged_alleles, ploidy)  # host np
    ncr = jnp.asarray(ncr_table(num_merged_alleles + ploidy + 2))
    G = combos.shape[0]
    nr = input_nr[..., None]                          # [R, S, 1]
    # per-ploidy-slot input alleles, each [R, S, G]
    slot_alleles = []
    combo_missing = jnp.zeros(inv_lut.shape[:2] + (G,), dtype=bool)
    for p in range(ploidy):
        a = inv_lut[..., combos[:, p]]                # [R, S, G]
        a = jnp.where(a == LUT_MISSING,
                      jnp.where(nr >= 0, nr, LUT_MISSING), a)
        combo_missing = combo_missing | (a == LUT_MISSING)
        slot_alleles.append(jnp.maximum(a, 0))
    # canonical genotype index of the sorted allele vector:
    # gt = sum_i C(i + a_i, a_i - 1)  (variant_field_handler.cc:299-321)
    sorted_slots = _sorting_network(slot_alleles)
    in_gt = jnp.zeros_like(sorted_slots[0])
    for i, a in enumerate(sorted_slots):
        in_gt = in_gt + ncr[i + a, a]
    in_range = in_gt < in_len[..., None]
    gathered = jnp.take_along_axis(
        values, jnp.clip(in_gt, 0, values.shape[-1] - 1), axis=-1)
    ok = (~combo_missing) & in_range
    # genotypes beyond the record's actual count stay missing
    max_allele = np.max(combos, axis=-1)              # [G] host
    in_record = jnp.asarray(max_allele)[None, :] < num_merged[:, None]
    ok = ok & in_record[:, None, :]
    return jnp.where(ok, gathered, INT_MISSING)


@partial(jax.jit, static_argnames=("alt_only",))
def remap_allele_fields(values: jnp.ndarray, inv_lut: jnp.ndarray,
                        in_len: jnp.ndarray, input_nr: jnp.ndarray,
                        num_merged: jnp.ndarray, alt_only: bool
                        ) -> jnp.ndarray:
    """Batched R/A-length remap (AD reorder).

    values: [R, S, K] padded; inv_lut: [R, S, M]; returns [R, S, M or M-1].
    """
    if alt_only:
        inv = inv_lut[..., 1:]
        offset = 1
    else:
        inv = inv_lut
        offset = 0
    nr = input_nr[..., None]
    in_allele = jnp.where(inv == LUT_MISSING,
                          jnp.where(nr >= 0, nr, LUT_MISSING), inv)
    idx = in_allele - offset
    ok = (in_allele != LUT_MISSING) & (idx >= 0) & (idx < in_len[..., None])
    gathered = jnp.take_along_axis(
        values, jnp.clip(idx, 0, values.shape[-1] - 1), axis=-1)
    m = jnp.arange(inv.shape[-1])[None, :]
    in_record = m < (num_merged[:, None] - offset)
    ok = ok & in_record[:, None, :]
    return jnp.where(ok, gathered, INT_MISSING)


@jax.jit
def masked_median_int(values: jnp.ndarray, valid: jnp.ndarray) -> Tuple[
        jnp.ndarray, jnp.ndarray]:
    """Reference median semantics (variant_field_handler.cc:530-560):
    ascending nth_element at n_valid/2 over the sample axis.

    values: [R, S]; valid: [R, S] bool.  Returns (median [R], any_valid [R]).
    """
    big = jnp.iinfo(jnp.int32).max
    v = jnp.where(valid, values, big)
    v = jnp.sort(v, axis=-1)
    n = jnp.sum(valid, axis=-1)
    idx = n // 2
    med = jnp.take_along_axis(v, jnp.clip(idx, 0, v.shape[-1] - 1)[..., None],
                              axis=-1)[..., 0]
    return med, n > 0


@jax.jit
def masked_median_float(values: jnp.ndarray, valid: jnp.ndarray):
    v = jnp.where(valid, values, jnp.inf)
    v = jnp.sort(v, axis=-1)
    n = jnp.sum(valid, axis=-1)
    idx = n // 2
    med = jnp.take_along_axis(v, jnp.clip(idx, 0, v.shape[-1] - 1)[..., None],
                              axis=-1)[..., 0]
    return med, n > 0


@jax.jit
def masked_sum(values: jnp.ndarray, valid: jnp.ndarray):
    s = jnp.sum(jnp.where(valid, values, 0), axis=-1)
    return s, jnp.any(valid, axis=-1)


@jax.jit
def dp_combine(dp_info: jnp.ndarray, dp_format: jnp.ndarray,
               min_dp: jnp.ndarray, v_info: jnp.ndarray,
               v_format: jnp.ndarray, v_min: jnp.ndarray):
    """INFO DP logic (broad_combined_gvcf.cc:690-726), batched [R, S]."""
    dp_val = jnp.where(v_info, dp_info,
                       jnp.where(v_min, min_dp,
                                 jnp.where(v_format, dp_format, 0)))
    use = v_info | v_min | v_format
    sum_dp = jnp.sum(jnp.where(use, dp_val, 0), axis=-1)
    return sum_dp


def interval_sweep(col: jnp.ndarray, eff_end: jnp.ndarray,
                   max_breakpoints: int):
    """Breakpoints of the aligned-interval sweep: unique(col ∪ eff_end+1).

    Static-size variant (padded with int64 max) of the event sweep the
    reference runs with an END-ordered PQ (query_variants.cc:296-332).
    Returns (starts [B], valid [B])."""
    events = jnp.concatenate([col, eff_end + 1])
    events = jnp.sort(events)
    uniq = jnp.concatenate([events[:1], jnp.where(
        events[1:] != events[:-1], events[1:], jnp.iinfo(jnp.int64).max)])
    uniq = jnp.sort(uniq)[:max_breakpoints]
    return uniq, uniq < jnp.iinfo(jnp.int64).max


@jax.jit
def live_cells_at(starts: jnp.ndarray, col_by_row: jnp.ndarray,
                  end_by_row: jnp.ndarray) -> jnp.ndarray:
    """Per (interval-start, row): index of the live cell, -1 if none.

    col_by_row/end_by_row: [S, C] per-row cell begins/effective-ENDs sorted
    ascending (padded with int64 max).  starts: [B].
    Replaces the left sweep + forward scan with a searchsorted gather.
    """
    def per_row(cols, ends):
        idx = jnp.searchsorted(cols, starts, side="right") - 1
        ok = idx >= 0
        idxc = jnp.clip(idx, 0, cols.shape[0] - 1)
        live = ok & (ends[idxc] >= starts)
        return jnp.where(live, idxc, -1)
    return jax.vmap(per_row, in_axes=(0, 0), out_axes=1)(
        col_by_row, end_by_row)   # [B, S]
