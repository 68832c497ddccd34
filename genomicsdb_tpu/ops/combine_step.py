"""End-to-end batched combine step (the flagship device computation).

One jit-compiled call performs, for a block of B aligned intervals over S
samples, everything the reference's per-position operator stack does
per record (scan_and_operate -> BroadCombinedGVCFOperator::operate,
query_variants.cc:334 / broad_combined_gvcf.cc:765) — as dense gathers and
masked reductions:

  1. live-cell selection per (interval, sample)     [searchsorted gather]
  2. PL genotype reorder onto merged alleles        [table gather]
  3. AD allele reorder                              [gather]
  4. GT remap + encode                              [gather + bit math]
  5. INFO combine ops: median (RankSums/MQ/MQ0), sum (RAW_MQ), DP logic
  6. GQ / MIN_DP / DP FORMAT collection

Merged-allele LUTs are precomputed at import time (per cell, against the
per-position merged allele dictionary) — the merge is query-invariant, so
query-time work is pure data movement, which is what a TPU is good at.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..core import formats
from . import jax_kernels as K

INT_MISSING = formats.INT_MISSING


@dataclass
class CellBlock:
    """Dense per-row cell layout for one column-partition block.

    S samples x C cells per sample (padded).  All int32 except coordinates.
    """
    col: np.ndarray        # [S, C] int64, padded with INT64_MAX
    end: np.ndarray        # [S, C] int64 effective ENDs
    pl: np.ndarray         # [S, C, G_in] int32 padded INT_MISSING
    pl_len: np.ndarray     # [S, C] int32
    ad: np.ndarray         # [S, C, A_in] int32
    ad_len: np.ndarray     # [S, C]
    gt: np.ndarray         # [S, C, P] int32 allele idxs (-1 no-call)
    gq: np.ndarray         # [S, C] int32 (INT_MISSING invalid)
    dp: np.ndarray         # [S, C] int32 FORMAT DP
    min_dp: np.ndarray     # [S, C] int32
    dp_info: np.ndarray    # [S, C] int32 INFO DP
    info_f: np.ndarray     # [F, S, C] float32 INFO float fields (median ops)
    raw_mq: np.ndarray     # [S, C] float32 (sum op)
    inv_lut: np.ndarray    # [S, C, M] merged->input allele idx (-1 absent)
    input_nr: np.ndarray   # [S, C] input NON_REF allele idx (-1 none)
    num_merged: np.ndarray  # [S, C] int32 #merged alleles of the cell's site
    # per-interval (precomputed by the sweep):
    starts: np.ndarray     # [B] int64 interval starts
    rec_num_merged: np.ndarray  # [B] int32 merged alleles per record
    live: np.ndarray = None  # [B, S] int32 live cell idx (-1 none); host-
    # precomputed (device derivation is a slow scalar-core gather)


def _gather_cells(x: jnp.ndarray, live: jnp.ndarray) -> jnp.ndarray:
    """x: [S, C, ...]; live: [B, S] cell idx (-1 none) -> [B, S, ...]."""
    idx = jnp.clip(live, 0, x.shape[1] - 1)
    out = jax.vmap(lambda xs, ls: xs[ls], in_axes=(0, 1), out_axes=1)(x, idx)
    return out


@partial(jax.jit, static_argnames=("max_merged", "ploidy", "use_pallas"))
def combine_step(col, end, pl, pl_len, ad, ad_len, gt, gq, dp, min_dp,
                 dp_info, info_f, raw_mq, inv_lut, input_nr, num_merged,
                 starts, rec_num_merged, live=None, *, max_merged: int,
                 ploidy: int,
                 use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
    if live is None:
        # fallback: derive the live matrix on device.  The production
        # path (store_to_block) already has it from the host sweep and
        # passes it in — a [B,S]-indexed gather over [S,C] lowers to a
        # slow scalar-core loop on TPU (~45% of the step).
        live = K.live_cells_at(starts, col, end)        # [B, S]
    valid = live >= 0

    def g(x):
        out = _gather_cells(x, live)
        return out

    inv = jnp.where(valid[..., None], g(inv_lut), -1)   # [B, S, M]
    nr = jnp.where(valid, g(input_nr), -1)
    # plg/adg are NOT masked here: invalid slots gather garbage, but the
    # remap kernels mask their outputs via inv==-1 (combo_missing /
    # in_allele) — masking them anyway costs a full padded-lane pass each
    plg = g(pl)
    pll = jnp.where(valid, g(pl_len), 0)
    adg = g(ad)
    adl = jnp.where(valid, g(ad_len), 0)
    # remaps (pallas: fused VMEM lane-gather for the PL reorder,
    # ops/pallas_remap.py; opt-in via GENOMICSDB_TPU_PALLAS=1 at call
    # sites — TPU-only, XLA path is the default and the CPU fallback)
    if use_pallas:
        from .pallas_remap import remap_genotype_fields_pallas
        pl_out = remap_genotype_fields_pallas(
            plg, inv, pll, nr, rec_num_merged,
            num_merged_alleles=max_merged, ploidy=ploidy)
    else:
        pl_out = K.remap_genotype_fields(plg, inv, pll, nr, rec_num_merged,
                                         num_merged_alleles=max_merged,
                                         ploidy=ploidy)
    ad_out = K.remap_allele_fields(adg, inv, adl, nr, rec_num_merged,
                                   alt_only=False)
    # GT remap: input allele -> merged allele (invert inv_lut).  Ploidy and
    # merged-allele axes are unrolled statically so every tensor stays
    # [B, S] (a [B,S,A,M] one-hot costs ~4x the whole step in HBM traffic).
    gtg = jnp.where(valid[..., None], g(gt), INT_MISSING)
    M_dim = inv.shape[-1]
    P_dim = gtg.shape[-1]
    nr_merged = rec_num_merged[:, None] - 1             # [B, 1]
    gt_cols = []
    for p in range(P_dim):
        a = gtg[..., p]                                 # [B, S]
        merged = jnp.full_like(a, -1)
        for m in range(M_dim):
            merged = jnp.where(inv[..., m] == a, m, merged)
        ok = (a >= 0) & (a != INT_MISSING)
        out_p = jnp.where(ok, jnp.where(merged >= 0, merged, nr_merged), a)
        gt_cols.append(out_p)
    gt_out = jnp.stack(gt_cols, axis=-1)
    # INFO medians over samples (valid float = payload-checked on host;
    # here invalid encoded as NaN -> excluded via isfinite)
    infog = jax.vmap(lambda f: _gather_cells(f, live))(info_f)  # [F,B,S]
    finite = jnp.isfinite(infog) & valid[None]
    med, med_ok = jax.vmap(K.masked_median_float)(
        jnp.where(finite, infog, jnp.inf), finite)
    # RAW_MQ sum
    rmq = _gather_cells(raw_mq, live)
    rmq_ok = jnp.isfinite(rmq) & valid
    rmq_sum, rmq_any = K.masked_sum(jnp.where(rmq_ok, rmq, 0), rmq_ok)
    # DP logic
    dpi = jnp.where(valid, g(dp_info), INT_MISSING)
    dpf = jnp.where(valid, g(dp), INT_MISSING)
    mdp = jnp.where(valid, g(min_dp), INT_MISSING)
    dp_sum = K.dp_combine(dpi, dpf, mdp, dpi != INT_MISSING,
                          dpf != INT_MISSING, mdp != INT_MISSING)
    gqg = jnp.where(valid, g(gq), INT_MISSING)
    return {
        "live": live, "pl": pl_out, "ad": ad_out, "gt": gt_out,
        "info_median": med, "info_median_ok": med_ok,
        "raw_mq_sum": rmq_sum, "raw_mq_ok": rmq_any,
        "dp_info_sum": dp_sum, "gq": gqg, "dp_format": dpf,
        "min_dp": mdp,
    }


def gather_block_host(blk: CellBlock, live: np.ndarray) -> Dict[str,
                                                                np.ndarray]:
    """Host-side live-cell gather: dense per-record inputs for
    combine_step_dense.  On PCIe/OCS-attached hosts, gathering on the
    host and uploading dense blocks beats on-device [B,S]-indexed
    gathers (which run on the TPU scalar core) by ~10x; through the
    debug tunnel the upload cost cancels the win (docs/performance.md)."""
    valid = live >= 0
    k = np.clip(live, 0, blk.col.shape[1] - 1)
    s_i = np.arange(blk.col.shape[0])[None, :]

    def g2(x, fill):
        return np.where(valid, x[s_i, k], fill)

    def g3(x, fill):
        return np.where(valid[..., None], x[s_i, k], fill)

    return {
        "plg": g3(blk.pl, INT_MISSING), "invg": g3(blk.inv_lut, -1),
        "pllg": g2(blk.pl_len, 0), "nrg": g2(blk.input_nr, -1),
        "adg": g3(blk.ad, INT_MISSING), "adlg": g2(blk.ad_len, 0),
        "gtg": g3(blk.gt, INT_MISSING), "gqg": g2(blk.gq, INT_MISSING),
        "dpfg": g2(blk.dp, INT_MISSING), "mdpg": g2(blk.min_dp,
                                                    INT_MISSING),
        "dpig": g2(blk.dp_info, INT_MISSING),
        "infog": np.where(valid[None], blk.info_f[:, s_i, k], np.nan),
        "rmqg": g2(blk.raw_mq, np.nan),
        "valid": valid,
    }


@partial(jax.jit, static_argnames=("max_merged", "ploidy"))
def combine_step_dense(plg, invg, pllg, nrg, adg, adlg, gtg, gqg, dpfg,
                       mdpg, dpig, infog, rmqg, valid, rec_num_merged, *,
                       max_merged: int, ploidy: int
                       ) -> Dict[str, jnp.ndarray]:
    """combine_step on HOST-pre-gathered dense inputs (gather_block_host):
    the device runs only the dense remap + reduction math."""
    pl_out = K.remap_genotype_fields(plg, invg, pllg, nrg, rec_num_merged,
                                     num_merged_alleles=max_merged,
                                     ploidy=ploidy)
    ad_out = K.remap_allele_fields(adg, invg, adlg, nrg, rec_num_merged,
                                   alt_only=False)
    M_dim = invg.shape[-1]
    P_dim = gtg.shape[-1]
    nr_merged = rec_num_merged[:, None] - 1
    gt_cols = []
    for p in range(P_dim):
        a = gtg[..., p]
        merged = jnp.full_like(a, -1)
        for m in range(M_dim):
            merged = jnp.where(invg[..., m] == a, m, merged)
        ok = (a >= 0) & (a != INT_MISSING)
        gt_cols.append(jnp.where(ok, jnp.where(merged >= 0, merged,
                                               nr_merged), a))
    gt_out = jnp.stack(gt_cols, axis=-1)
    finite = jnp.isfinite(infog) & valid[None]
    med, med_ok = jax.vmap(K.masked_median_float)(
        jnp.where(finite, infog, jnp.inf), finite)
    rmq_ok = jnp.isfinite(rmqg) & valid
    rmq_sum, rmq_any = K.masked_sum(jnp.where(rmq_ok, rmqg, 0), rmq_ok)
    dp_sum = K.dp_combine(dpig, dpfg, mdpg, dpig != INT_MISSING,
                          dpfg != INT_MISSING, mdpg != INT_MISSING)
    return {
        "pl": pl_out, "ad": ad_out, "gt": gt_out,
        "info_median": med, "info_median_ok": med_ok,
        "raw_mq_sum": rmq_sum, "raw_mq_ok": rmq_any,
        "dp_info_sum": dp_sum, "gq": gqg, "dp_format": dpfg,
        "min_dp": mdpg,
    }


def block_to_args(blk: CellBlock):
    return (blk.col, blk.end, blk.pl, blk.pl_len, blk.ad, blk.ad_len,
            blk.gt, blk.gq, blk.dp, blk.min_dp, blk.dp_info, blk.info_f,
            blk.raw_mq, blk.inv_lut, blk.input_nr, blk.num_merged,
            blk.starts, blk.rec_num_merged, blk.live)


def live_cells_at_host(starts: np.ndarray, col: np.ndarray,
                       end: np.ndarray) -> np.ndarray:
    """numpy twin of jax_kernels.live_cells_at ([B, S] int32)."""
    B, (S, C) = len(starts), col.shape
    live = np.full((B, S), -1, dtype=np.int32)
    for s in range(S):
        idx = np.searchsorted(col[s], starts, side="right") - 1
        ok = idx >= 0
        idxc = np.clip(idx, 0, C - 1)
        ok &= end[s, idxc] >= starts
        live[:, s] = np.where(ok, idxc, -1)
    return live


def synthesize_cohort(num_samples: int, cells_per_sample: int,
                      region_len: int, seed: int = 0,
                      variant_fraction: float = 0.1,
                      max_merged: int = 4, ploidy: int = 2) -> CellBlock:
    """Synthetic gVCF cohort block: ref blocks + multi-allelic variant
    sites shared across samples (GVCF-shaped workload for the bench)."""
    rng = np.random.default_rng(seed)
    S, C = num_samples, cells_per_sample
    G_in = max_merged * (max_merged + 1) // 2
    A_in = max_merged
    # per-sample interval tiling of the region
    bounds = np.sort(rng.integers(0, region_len, size=(S, C - 1)), axis=1)
    col = np.concatenate([np.zeros((S, 1), np.int64), bounds], axis=1)
    end = np.concatenate([bounds - 1, np.full((S, 1), region_len - 1,
                                              np.int64)], axis=1)
    # fix zero-length collisions
    bad = end < col
    end = np.where(bad, col, end)
    is_var = rng.random((S, C)) < variant_fraction
    n_in_alleles = np.where(is_var, rng.integers(2, max_merged + 1,
                                                 size=(S, C)), 2)
    pl = rng.integers(0, 2000, size=(S, C, G_in)).astype(np.int32)
    pl_len = (n_in_alleles * (n_in_alleles + 1) // 2).astype(np.int32)
    ad = rng.integers(0, 100, size=(S, C, A_in)).astype(np.int32)
    ad_len = n_in_alleles.astype(np.int32)
    gt = rng.integers(0, 2, size=(S, C, ploidy)).astype(np.int32)
    gq = rng.integers(0, 100, size=(S, C)).astype(np.int32)
    dp = rng.integers(0, 100, size=(S, C)).astype(np.int32)
    min_dp = np.where(is_var, INT_MISSING,
                      rng.integers(0, 40, size=(S, C))).astype(np.int32)
    dp_info = np.where(is_var, rng.integers(0, 100, size=(S, C)),
                       INT_MISSING).astype(np.int32)
    F = 7  # BaseQRankSum/Clipping/MQRankSum/ReadPos/MQ/MQ0/extra
    info_f = rng.normal(size=(F, S, C)).astype(np.float32)
    info_f = np.where(is_var[None], info_f, np.nan).astype(np.float32)
    raw_mq = np.where(is_var, rng.random((S, C)) * 100, np.nan
                      ).astype(np.float32)
    # LUTs mirror the real merge invariant: cell alleles 0..n_in-2 map to
    # merged 0..n_in-2, the cell's NON_REF (last input allele) maps to the
    # LAST merged allele, middle merged alleles are absent (-1).
    inv_lut = np.full((S, C, max_merged), -1, dtype=np.int32)
    inv_lut[..., 0] = 0
    for m in range(1, max_merged - 1):
        inv_lut[..., m] = np.where(m < n_in_alleles - 1, m, -1)
    inv_lut[..., max_merged - 1] = n_in_alleles - 1  # NON_REF last
    input_nr = (n_in_alleles - 1).astype(np.int32)
    num_merged = n_in_alleles.astype(np.int32)
    # sweep on host for the synthetic block
    events = np.unique(np.concatenate([col.ravel(), end.ravel() + 1]))
    starts = events[events < region_len]
    rec_num_merged = np.full(len(starts), max_merged, dtype=np.int32)
    return CellBlock(col=col, end=end, pl=pl, pl_len=pl_len, ad=ad,
                     ad_len=ad_len, gt=gt, gq=gq, dp=dp, min_dp=min_dp,
                     dp_info=dp_info, info_f=info_f, raw_mq=raw_mq,
                     inv_lut=inv_lut, input_nr=input_nr,
                     num_merged=num_merged, starts=starts,
                     rec_num_merged=rec_num_merged)
