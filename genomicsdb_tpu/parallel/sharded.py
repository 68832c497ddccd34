"""Multi-chip sharded combine (jax.sharding + shard_map).

Parallelism maps the reference's two distribution strategies onto a 2-D
device mesh (SURVEY.md §2.7):
  * "pos"  axis: column partitions (the genome position axis) — the
    MPI-rank-per-partition model (tools/src/vcf2tiledb.cc:44-52) becomes
    position-sharded interval blocks; combine is partition-local.
  * "row"  axis: row/sample partitioning ("row_based_partitioning",
    genomicsdb_config_base.h:163) — INFO combine ops reduce across the
    sample axis, so sample-sharded execution uses ICI collectives
    (psum / all_gather) instead of the reference's process-local loops.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import formats
from ..ops import jax_kernels as K
from ..ops.combine_step import CellBlock, block_to_args

INT_MISSING = formats.INT_MISSING


def make_mesh(n_pos: int, n_row: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None
                         else jax.devices()[:n_pos * n_row])
    return Mesh(devices.reshape(n_pos, n_row), ("pos", "row"))


def sharded_combine_step(mesh: Mesh, max_merged: int, ploidy: int):
    """Build the pjit-ed sharded combine step for a mesh.

    Cells are sharded over "row" (samples); intervals over "pos".  The
    sample-axis reductions (INFO median/sum, DP sum) run as collectives
    over the "row" axis; everything else is local.
    """

    def step(col, end, pl, pl_len, ad, ad_len, gt, gq, dp, min_dp,
             dp_info, info_f, raw_mq, inv_lut, input_nr, num_merged,
             starts, rec_num_merged) -> Dict[str, jnp.ndarray]:
        # local shard shapes: [S_loc, C], starts: [B_loc]
        live = K.live_cells_at(starts, col, end)        # [B_loc, S_loc]
        valid = live >= 0

        def g(x):
            idx = jnp.clip(live, 0, x.shape[1] - 1)
            return jax.vmap(lambda xs, ls: xs[ls],
                            in_axes=(0, 1), out_axes=1)(x, idx)

        inv = jnp.where(valid[..., None], g(inv_lut), -1)
        nr = jnp.where(valid, g(input_nr), -1)
        plg = jnp.where(valid[..., None], g(pl), INT_MISSING)
        pll = jnp.where(valid, g(pl_len), 0)
        pl_out = K.remap_genotype_fields(plg, inv, pll, nr, rec_num_merged,
                                         num_merged_alleles=max_merged,
                                         ploidy=ploidy)
        adg = jnp.where(valid[..., None], g(ad), INT_MISSING)
        adl = jnp.where(valid, g(ad_len), 0)
        ad_out = K.remap_allele_fields(adg, inv, adl, nr, rec_num_merged,
                                       alt_only=False)
        # ---- cross-sample reductions: collectives over the "row" axis ----
        infog = jax.vmap(lambda f: g(f))(info_f)        # [F, B_loc, S_loc]
        finite = jnp.isfinite(infog) & valid[None]
        # median needs the full sample axis: all_gather over "row" (ICI)
        info_full = jax.lax.all_gather(infog, "row", axis=2, tiled=True)
        finite_full = jax.lax.all_gather(finite, "row", axis=2, tiled=True)
        med, med_ok = jax.vmap(K.masked_median_float)(
            jnp.where(finite_full, info_full, jnp.inf), finite_full)
        # sums are psum-able partial reductions
        rmq = g(raw_mq)
        rmq_ok = jnp.isfinite(rmq) & valid
        rmq_local = jnp.sum(jnp.where(rmq_ok, rmq, 0), axis=-1)
        rmq_sum = jax.lax.psum(rmq_local, "row")
        rmq_any = jax.lax.psum(jnp.sum(rmq_ok, axis=-1), "row") > 0
        dpi = jnp.where(valid, g(dp_info), INT_MISSING)
        dpf = jnp.where(valid, g(dp), INT_MISSING)
        mdp = jnp.where(valid, g(min_dp), INT_MISSING)
        dp_val = jnp.where(dpi != INT_MISSING, dpi,
                           jnp.where(mdp != INT_MISSING, mdp,
                                     jnp.where(dpf != INT_MISSING, dpf, 0)))
        use = (dpi != INT_MISSING) | (mdp != INT_MISSING) | \
            (dpf != INT_MISSING)
        dp_sum = jax.lax.psum(jnp.sum(jnp.where(use, dp_val, 0), axis=-1),
                              "row")
        return {"pl": pl_out, "ad": ad_out, "info_median": med,
                "info_median_ok": med_ok, "raw_mq_sum": rmq_sum,
                "raw_mq_ok": rmq_any, "dp_info_sum": dp_sum}

    cell_sc = P("row", None)       # [S, C]
    cell_sc3 = P("row", None, None)
    specs_in = (
        cell_sc, cell_sc,                  # col, end
        cell_sc3, cell_sc,                 # pl, pl_len
        cell_sc3, cell_sc,                 # ad, ad_len
        cell_sc3, cell_sc, cell_sc, cell_sc, cell_sc,  # gt,gq,dp,min_dp,dpi
        P(None, "row", None),              # info_f [F, S, C]
        cell_sc,                           # raw_mq
        cell_sc3, cell_sc, cell_sc,        # inv_lut, input_nr, num_merged
        P("pos"), P("pos"),                # starts, rec_num_merged
    )
    specs_out = {
        "pl": P("pos", "row", None), "ad": P("pos", "row", None),
        "info_median": P(None, "pos"), "info_median_ok": P(None, "pos"),
        "raw_mq_sum": P("pos"), "raw_mq_ok": P("pos"),
        "dp_info_sum": P("pos"),
    }
    fn = shard_map(step, mesh=mesh, in_specs=specs_in, out_specs=specs_out,
                   check_rep=False)
    return jax.jit(fn)


def pad_block_for_mesh(blk: CellBlock, n_pos: int, n_row: int) -> CellBlock:
    """Pad sample count and interval count to multiples of the mesh dims."""
    import copy
    S = blk.col.shape[0]
    B = len(blk.starts)
    S_pad = (-S) % n_row
    B_pad = (-B) % n_pos
    out = copy.copy(blk)
    if S_pad:
        def padS(x, fill):
            pad_width = [(0, S_pad)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, pad_width, constant_values=fill)
        out.col = padS(blk.col, np.iinfo(np.int64).max)
        out.end = padS(blk.end, 0)
        out.pl = padS(blk.pl, INT_MISSING)
        out.pl_len = padS(blk.pl_len, 0)
        out.ad = padS(blk.ad, INT_MISSING)
        out.ad_len = padS(blk.ad_len, 0)
        out.gt = padS(blk.gt, -1)
        out.gq = padS(blk.gq, INT_MISSING)
        out.dp = padS(blk.dp, INT_MISSING)
        out.min_dp = padS(blk.min_dp, INT_MISSING)
        out.dp_info = padS(blk.dp_info, INT_MISSING)
        out.info_f = np.pad(blk.info_f, [(0, 0), (0, S_pad), (0, 0)],
                            constant_values=np.nan)
        out.raw_mq = padS(blk.raw_mq, np.nan)
        out.inv_lut = padS(blk.inv_lut, -1)
        out.input_nr = padS(blk.input_nr, -1)
        out.num_merged = padS(blk.num_merged, 1)
    if B_pad:
        out.starts = np.pad(out.starts, (0, B_pad),
                            constant_values=np.iinfo(np.int64).max - 1)
        out.rec_num_merged = np.pad(out.rec_num_merged, (0, B_pad),
                                    constant_values=1)
    out.live = None   # sharded step derives live per shard
    return out


def shard_block(mesh: Mesh, blk: CellBlock):
    """Device-put block arrays with the step's input shardings.

    The sharded step derives `live` on device (each (pos, row) shard
    needs only its local [B_loc, S_loc] slab), so blk.live is dropped."""
    args = block_to_args(blk)[:18]
    cell_sc = NamedSharding(mesh, P("row", None))
    cell_sc3 = NamedSharding(mesh, P("row", None, None))
    info_s = NamedSharding(mesh, P(None, "row", None))
    pos_s = NamedSharding(mesh, P("pos"))
    shardings = (cell_sc, cell_sc, cell_sc3, cell_sc, cell_sc3, cell_sc,
                 cell_sc3, cell_sc, cell_sc, cell_sc, cell_sc, info_s,
                 cell_sc, cell_sc3, cell_sc, cell_sc, pos_s, pos_s)
    return tuple(jax.device_put(a, s) for a, s in zip(args, shardings))
