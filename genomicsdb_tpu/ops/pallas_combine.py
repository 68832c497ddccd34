"""Fused Pallas TPU kernel: windowed live-cell gather + allele remaps.

The combine's device cost on the gathered path is dominated by
[B,S]-indexed gathers over [S,C] cell tensors — XLA lowers them onto the
TPU scalar core (~70 ms of the 119 ms 8192x128 chunk,
docs/performance.md).  This kernel exploits the sweep's structure:
`live[b, s]` is NON-DECREASING in b (records advance through each
sample's cells in order), so a tile of Bt consecutive records touches a
narrow window of cells.  Per (record-tile, sample) grid instance it

  1. DMAs the payload window [V, 2*Cb] (all per-cell fields, one int32
     slab with floats bit-cast) HBM -> VMEM via two scalar-prefetched
     block indices,
  2. gathers rows with a LANE-axis take_along_axis (records ride the
     128-lane axis; Mosaic lowers lane gathers onto the VPU),
  3. runs the full PL/AD/GT remap math in VMEM ([X, Bt] layout,
     jax_kernels semantics: variant_field_handler.cc:42-420), and
  4. writes one stacked [Vout, Bt] output tile.

Cross-sample INFO reductions stay in XLA (combine_step._reduce_math) —
they read only the small gathered rows this kernel emits.

The window premise is checked on the host (fused_window_plan): chunks
where some tile advances more than Cb cells fall back to the XLA path.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import numpy as np

import jax

if sys.getrecursionlimit() < 100000:
    sys.setrecursionlimit(100000)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import formats
from . import jax_kernels as K

INT_MISSING = formats.INT_MISSING


def _gt_index_term(a, i: int):
    """C(a+i, i+1) as a closed-form polynomial in `a`: the canonical
    genotype-index contribution of ascending-sorted allele slot i
    (variant_field_handler.cc:299-321).  The product of i+1 consecutive
    integers is exactly divisible by (i+1)!, so one integer division of
    the full product is exact.  int32-safe for a <= 15, i <= 5 (the
    fused path's m <= 16, ploidy <= 6 gates)."""
    import math
    term = a
    for j in range(1, i + 1):
        term = term * (a + jnp.int32(j))
    return term // jnp.int32(math.factorial(i + 1))


@dataclass(frozen=True)
class FusedConfig:
    """Static shape/layout configuration of the fused kernel."""
    g_in: int          # PL input width
    g_out: int         # PL output width (genotypes of max_merged)
    a_in: int          # AD input width
    m: int             # max_merged
    gt_w: int          # stored GT width (2p-1 when phased)
    f_med: int         # float-median INFO rows
    f_imed: int        # int-median INFO rows
    f_fsum: int        # float-sum INFO rows
    ploidy: int
    gt_phase: bool
    # the Mosaic lane-gather operates within one 128-lane vreg and the
    # lane dimension of a block must be a multiple of 128: the window is
    # two 128-cell blocks gathered separately and select-merged
    bt: int = 128      # records per tile (lane axis, <= 128)
    cb: int = 128      # window block size (cells, multiple of 128)
    # record sublanes per grid instance: 1 = per-(128-records, sample)
    # kernel; rt > 1 = sublane-packed kernel (rt*128 records per
    # instance, rt x fewer grid launches, full-vreg math)
    rt: int = 1
    # mixed (per-call) ploidy: remap once per ploidy class 1..ploidy and
    # select per call by its GT-derived ploidy (the batched form of
    # variant_field_handler.cc:199-296) — sex-chromosome cohorts
    mixed: bool = False
    # shared-window width in cb blocks (rt kernel only).  0 = one
    # 2-block window per record SUBLANE (2*rt window DMAs per grid
    # instance); ws > 0 = ONE ws-block window per grid INSTANCE shared
    # by all rt sublanes.  A sample's cell index advances only a
    # handful of cells across an instance's rt*bt records, so the
    # per-sublane windows are almost always the same bytes — sharing
    # cuts the window DMA volume rt*2/ws-fold (8x at rt=8, ws=2).
    ws: int = 0
    # narrow outputs (rt kernel only): emit the PL/AD/GT rows — the
    # bulk of Vout — as a SEPARATE int16 tensor with the BCF narrow
    # sentinels (-32768 missing / -32767 vector-end) already applied.
    # Halves the kernel's dominant HBM write volume and makes the
    # device->host pack step a pure bitcast for those rows.  Only legal
    # when the host has proven every input value fits int16
    # (combine_step_fused checks the payload ranges — remaps are pure
    # permutations, so input range bounds output range).
    narrow: bool = False
    # also emit the GQ/DP/MIN_DP scalar rows int16 (they are masked
    # passthroughs, so payload range bounds output range): skips the
    # pack step's re-narrow pass for those PACK_SPECS rows and halves
    # their kernel write + post-pass read volume.  Requires narrow.
    narrow_scalars: bool = False

    # payload row ranges [start, stop)
    @property
    def rows(self) -> Dict[str, Tuple[int, int]]:
        r, out = 0, {}
        for name, w in (("pl", self.g_in), ("pl_len", 1),
                        ("ad", self.a_in), ("ad_len", 1),
                        ("gt", self.gt_w), ("gq", 1), ("dpf", 1),
                        ("mdp", 1), ("dpi", 1), ("info_f", self.f_med),
                        ("info_i", self.f_imed),
                        ("info_fs", self.f_fsum)):
            out[name] = (r, r + w)
            r += w
        out["__total__"] = (0, r)
        return out

    @property
    def v(self) -> int:
        return self.rows["__total__"][1]

    @property
    def out_rows(self) -> Dict[str, Tuple[int, int]]:
        r, out = 0, {}
        for name, w in (("pl", self.g_out), ("ad", self.m),
                        ("gt", self.gt_w), ("gq", 1), ("dpf", 1),
                        ("mdp", 1), ("dpi", 1), ("info_f", self.f_med),
                        ("info_i", self.f_imed),
                        ("info_fs", self.f_fsum)):
            out[name] = (r, r + w)
            r += w
        out["__total__"] = (0, r)
        return out

    @property
    def vout(self) -> int:
        return self.out_rows["__total__"][1]

    # row maps of the split (narrow) output form
    @property
    def out_rows16(self) -> Dict[str, Tuple[int, int]]:
        r, out = 0, {}
        names = [("pl", self.g_out), ("ad", self.m), ("gt", self.gt_w)]
        if self.narrow_scalars:
            names += [("gq", 1), ("dpf", 1), ("mdp", 1)]
        for name, w in names:
            out[name] = (r, r + w)
            r += w
        out["__total__"] = (0, r)
        return out

    @property
    def out_rows32(self) -> Dict[str, Tuple[int, int]]:
        r, out = 0, {}
        names = [] if self.narrow_scalars \
            else [("gq", 1), ("dpf", 1), ("mdp", 1)]
        names += [("dpi", 1), ("info_f", self.f_med),
                  ("info_i", self.f_imed), ("info_fs", self.f_fsum)]
        for name, w in names:
            out[name] = (r, r + w)
            r += w
        out["__total__"] = (0, r)
        return out

    @property
    def vout16(self) -> int:
        return self.out_rows16["__total__"][1]

    @property
    def vout32(self) -> int:
        return self.out_rows32["__total__"][1]


def build_payload(blk, cfg: FusedConfig, cpad: int = 0) -> np.ndarray:
    """[S, V, C+cpad] int32 slab of every per-cell field (floats
    bit-cast); `cpad` window padding is allocated up front so no
    whole-slab copy happens afterwards."""
    S, C = blk.col.shape
    pay = np.full((S, cfg.v, C + cpad), INT_MISSING, dtype=np.int32)
    r = cfg.rows

    def put(name, arr):
        lo, hi = r[name]
        pay[:, lo:hi, :C] = arr

    put("pl", np.moveaxis(blk.pl, -1, 1))
    put("pl_len", blk.pl_len[:, None, :])
    put("ad", np.moveaxis(blk.ad, -1, 1))
    put("ad_len", blk.ad_len[:, None, :])
    put("gt", np.moveaxis(blk.gt, -1, 1))
    put("gq", blk.gq[:, None, :])
    put("dpf", blk.dp[:, None, :])
    put("mdp", blk.min_dp[:, None, :])
    put("dpi", blk.dp_info[:, None, :])
    if cfg.f_med:
        put("info_f", np.moveaxis(blk.info_f, 0, 1).view(np.int32))
    if cfg.f_imed:
        put("info_i", np.moveaxis(blk.info_i, 0, 1))
    if cfg.f_fsum:
        put("info_fs", np.moveaxis(blk.info_fs, 0, 1).view(np.int32))
    return pay


def fused_window_plan(live: np.ndarray, cfg: FusedConfig):
    """Per-(tile, sample) window block starts; None when some tile's
    cell advance exceeds the window (fall back to the XLA gather)."""
    B, S = live.shape
    bt, cb = cfg.bt, cfg.cb
    pad = (-B) % bt
    lv = np.pad(live, ((0, pad), (0, 0)), constant_values=-1)
    T = lv.shape[0] // bt
    lt = lv.reshape(T, bt, S)
    valid = lt >= 0
    big = np.int64(1) << 40
    w0 = np.where(valid, lt, big).min(axis=1)          # [T, S]
    wmax = np.where(valid, lt, -1).max(axis=1)
    w0 = np.where(w0 == big, 0, w0)
    w0b = (w0 // cb).astype(np.int32)
    if ((wmax - w0b.astype(np.int64) * cb) >= 2 * cb).any():
        return None
    return w0b


def fused_window_plan_shared(live: np.ndarray, cfg: FusedConfig,
                             n_blocks: int, max_ws: int = 4,
                             min_ws: int = 2):
    """Per-(rt-group, sample) SHARED window block starts.

    live: [Bp, S] padded to a multiple of rt*bt.  Returns
    (w2s [T2, S] int32, ws) with the smallest power-of-two window
    width (in cb blocks, >= 2) covering every instance's cell span, or
    None when some instance needs more than `max_ws` blocks (caller
    falls back to per-sublane windows / the XLA gather)."""
    B, S = live.shape
    unit = cfg.bt * cfg.rt
    assert B % unit == 0
    T2 = B // unit
    lt = live.reshape(T2, unit, S)
    valid = lt >= 0
    big = np.int64(1) << 40
    lo = np.where(valid, lt, big).min(axis=1)          # [T2, S]
    hi = np.where(valid, lt, -1).max(axis=1)
    lo = np.where(lo == big, 0, lo)
    base = (lo // cfg.cb).astype(np.int64)
    ws = min_ws
    while ws <= max_ws:
        b = np.minimum(base, max(n_blocks - ws, 0))
        if ((hi - b * cfg.cb) < ws * cfg.cb).all():
            return b.astype(np.int32), ws
        ws *= 2
    return None


def _make_kernel(cfg: FusedConfig):
    r = cfg.rows
    ro = cfg.out_rows
    combos = K.genotype_combo_table(cfg.m, cfg.ploidy)     # [G_out, P]
    G = combos.shape[0]
    assert G == cfg.g_out
    max_allele = np.max(combos, axis=-1)                   # [G_out]

    def kernel(w0b_ref, live_ref, inv_ref, nr_ref, recnm_ref, recnr_ref,
               winA_ref, winB_ref, out_ref):
        t = pl.program_id(0)
        s = pl.program_id(1)
        base = w0b_ref[t, s] * jnp.int32(cfg.cb)
        live = live_ref[0]                         # [1, Bt]
        valid = live >= 0
        rel = jnp.where(valid, live - base, 0)     # [1, Bt] in [0, 2Cb)
        # one lane-gather per 128-cell window block (the Mosaic
        # dynamic_gather works within a single 128-lane vreg), merged by
        # which half the index falls in
        relA = jnp.minimum(rel, jnp.int32(cfg.cb - 1))
        relB = jnp.minimum(jnp.maximum(rel - jnp.int32(cfg.cb),
                                       jnp.int32(0)),
                           jnp.int32(cfg.cb - 1))
        idxA = jnp.broadcast_to(relA, (cfg.v, cfg.bt))
        idxB = jnp.broadcast_to(relB, (cfg.v, cfg.bt))
        gA = jnp.take_along_axis(winA_ref[0], idxA, axis=-1)
        gB = jnp.take_along_axis(winB_ref[0], idxB, axis=-1)
        in_b = jnp.broadcast_to(rel >= jnp.int32(cfg.cb),
                                (cfg.v, cfg.bt))
        g = jnp.where(in_b, gB, gA)                # [V, Bt]
        inv = inv_ref[0]                           # [M, Bt]
        nr = nr_ref[0]                             # [1, Bt]
        recnm = recnm_ref[:]                       # [1, Bt]
        recnr = recnr_ref[:]                       # [1, Bt]
        nr_merged = jnp.where(recnr != 0, recnm - 1, -1)   # [1, Bt]

        def row(name, i=0):
            lo, _ = r[name]
            return g[lo + i:lo + i + 1]            # [1, Bt]

        # ---- PL genotype remap (jax_kernels.remap_genotype_fields) ----
        pll = row("pl_len")
        slot_alleles = []
        combo_missing = [None] * G       # int32 0/1 rows (Mosaic cannot
        for p in range(cfg.ploidy):      # concatenate i1 vregs)
            rows_a = []
            for gi in range(G):
                a = inv[combos[gi, p]:combos[gi, p] + 1]   # [1, Bt]
                a = jnp.where(a == -1, jnp.where(nr >= 0, nr, -1), a)
                rows_a.append(a)
                miss = jnp.where(a == -1, jnp.int32(1), jnp.int32(0))
                combo_missing[gi] = miss if combo_missing[gi] is None \
                    else jnp.maximum(combo_missing[gi], miss)
            slot_alleles.append(jnp.concatenate(rows_a, axis=0))  # [G, Bt]
        cmiss = jnp.concatenate(combo_missing, axis=0) != 0  # [G, Bt]
        slots = [jnp.maximum(a, 0) for a in slot_alleles]
        slots = K._sorting_network(slots)
        in_gt = jnp.zeros((G, cfg.bt), jnp.int32)
        for i, a in enumerate(slots):
            in_gt = in_gt + _gt_index_term(a, i)
        ok = (~cmiss) & (in_gt < pll)
        # static per-genotype max allele: scalar compares, no captured
        # array constants (Pallas kernels cannot close over tensors)
        in_rec = jnp.concatenate(
            [jnp.where(jnp.int32(int(max_allele[gi])) < recnm,
                       jnp.int32(1), jnp.int32(0)) for gi in range(G)],
            axis=0)
        ok = ok & (in_rec != 0)
        pl_lo = r["pl"][0]
        gathered = jnp.full((G, cfg.bt), INT_MISSING, jnp.int32)
        for k in range(cfg.g_in):
            gathered = jnp.where(in_gt == jnp.int32(k),
                                 g[pl_lo + k:pl_lo + k + 1], gathered)
        pl_out = jnp.where(ok, gathered, INT_MISSING)

        # ---- AD allele remap (remap_allele_fields, alt_only=False) ----
        adl = row("ad_len")
        in_allele = jnp.where(inv == -1,
                              jnp.where(nr >= 0, nr, -1), inv)  # [M, Bt]
        ok_a = (in_allele != -1) & (in_allele >= 0) & (in_allele < adl)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (cfg.m, cfg.bt), 0)
        ok_a = ok_a & (m_iota < recnm)
        ad_lo = r["ad"][0]
        g_ad = jnp.full((cfg.m, cfg.bt), INT_MISSING, jnp.int32)
        for k in range(cfg.a_in):
            g_ad = jnp.where(in_allele == jnp.int32(k),
                             g[ad_lo + k:ad_lo + k + 1], g_ad)
        ad_out = jnp.where(ok_a, g_ad, INT_MISSING)

        # ---- GT remap (gt_remap_unrolled semantics) ----
        gt_rows = []
        for p in range(cfg.gt_w):
            a = row("gt", p)
            a = jnp.where(valid, a, INT_MISSING)
            if cfg.gt_phase and p % 2 == 1:
                gt_rows.append(a)
                continue
            merged = jnp.full((1, cfg.bt), -1, jnp.int32)
            for mi in range(cfg.m):
                merged = jnp.where(inv[mi:mi + 1] == a, mi, merged)
            okg = (a >= 0) & (a != INT_MISSING)
            gt_rows.append(jnp.where(
                okg, jnp.where(merged >= 0, merged, nr_merged), a))
        gt_out = jnp.concatenate(gt_rows, axis=0)

        # ---- passthrough scalars + INFO rows (masked by validity;
        # float rows use quiet-NaN bits so -0.0 stays a legal value) ----
        NAN_BITS = jnp.int32(np.int32(np.float32(np.nan).view(np.int32)))

        def masked(name, i=0, fl=False):
            fill = NAN_BITS if fl else jnp.int32(INT_MISSING)
            return jnp.where(valid, row(name, i), fill)

        parts = [pl_out, ad_out, gt_out, masked("gq"), masked("dpf"),
                 masked("mdp"), masked("dpi")]
        for blkname, n, fl in (("info_f", cfg.f_med, True),
                               ("info_i", cfg.f_imed, False),
                               ("info_fs", cfg.f_fsum, True)):
            for i in range(n):
                parts.append(masked(blkname, i, fl))
        out_ref[0] = jnp.concatenate(parts, axis=0)
        _ = ro

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_gather_remap(payload, live_t, inv_t, nr_t, recnm2, recnr2, w0b,
                       *, cfg: FusedConfig, interpret: bool = False):
    """payload [S, V, Cpad]; live_t/nr_t [S, 1, Bpad]; inv_t
    [S, M, Bpad]; recnm2/recnr2 [1, Bpad]; w0b [T, S].
    Returns [S, Vout, Bpad]."""
    S = payload.shape[0]
    Bpad = live_t.shape[2]
    T = Bpad // cfg.bt
    # per-chunk inputs may arrive narrowed (int8/int16) to cut the
    # host->device upload; the kernel consumes int32
    live_t = live_t.astype(jnp.int32)
    inv_t = inv_t.astype(jnp.int32)
    nr_t = nr_t.astype(jnp.int32)
    recnm2 = recnm2.astype(jnp.int32)
    recnr2 = recnr2.astype(jnp.int32)
    kernel = _make_kernel(cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, S),
        in_specs=[
            pl.BlockSpec((1, 1, cfg.bt), lambda t, s, w: (s, 0, t)),  # live
            pl.BlockSpec((1, cfg.m, cfg.bt),
                         lambda t, s, w: (s, 0, t)),                 # inv
            pl.BlockSpec((1, 1, cfg.bt), lambda t, s, w: (s, 0, t)),  # nr
            pl.BlockSpec((1, cfg.bt), lambda t, s, w: (0, t)),       # recnm
            pl.BlockSpec((1, cfg.bt), lambda t, s, w: (0, t)),       # recnr
            pl.BlockSpec((1, cfg.v, cfg.cb),
                         lambda t, s, w: (s, 0, w[t, s])),           # winA
            pl.BlockSpec((1, cfg.v, cfg.cb),
                         lambda t, s, w: (s, 0, w[t, s] + 1)),       # winB
        ],
        out_specs=pl.BlockSpec((1, cfg.vout, cfg.bt),
                               lambda t, s, w: (s, 0, t)),
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, cfg.vout, Bpad),
                                           jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(w0b, live_t, inv_t, nr_t, recnm2, recnr2, payload, payload)


def _default_rt() -> int:
    """Record-sublanes per grid instance.  8 measures 1.74x over the
    per-sample kernel on a v5e; with shared windows (round 3) rt=32
    measures another ~15% on sparse cohorts and is auto-tried first
    (combine_step_fused) when this returns the default — see
    docs/performance.md."""
    import os
    try:
        return max(1, int(os.environ.get("GENOMICSDB_TPU_FUSED_RT",
                                         "8")))
    except ValueError:
        return 8


def _rt_candidates(rt_arg: int) -> tuple:
    """rt values to try in order.  An explicit rt (argument or env)
    pins one; the default tries the largest sublane packing first
    (fewer grid instances — the measured per-instance issue overhead,
    not gathers or math, is what rt amortizes: 64 measures +7% over 32
    on the bench cohort) and falls back toward 8 (dense gVCF keeps the
    shared-window premise at smaller spans), then 4/2 for configs whose
    per-instance VMEM footprint rejects the big rts (wide G_out: high
    ploidy and/or many merged alleles)."""
    import os
    if rt_arg:
        return (rt_arg,)
    if os.environ.get("GENOMICSDB_TPU_FUSED_RT"):
        return (_default_rt(),)
    return (64, 32, 8, 4, 2)


def scoped_vmem_estimate(cfg: FusedConfig) -> int:
    """Approximate scoped-VMEM bytes of one _make_kernel_rt grid
    instance: the sum of the major live [*, rt, Bt] int32 temporaries.
    Calibrated against a measured Mosaic stack OOM (mixed triploid
    m=8 gt_w=5 V=54 Vout=144 at rt=32 allocates 21.2M; this returns
    23.8M — a ~12% conservative overestimate).  Used to clamp the
    auto-tried rt BEFORE paying a remote compile that would exceed the
    16M scoped-vmem limit."""
    from math import comb
    rows = 0
    rows += 2 * cfg.v                     # g3 stack + window-gather acc
    ploidies = range(1, cfg.ploidy + 1) if cfg.mixed else (cfg.ploidy,)
    for p in ploidies:                    # per pl_section temporaries:
        g_p = comb(cfg.m + p - 1, p)      # slot_alleles (p rows/combo),
        rows += (p + 3) * g_p             # cmiss, in_gt, gathered
    rows += (2 if cfg.mixed else 1) * cfg.g_out   # pl_out (+ class pad)
    rows += 3 * cfg.m                     # in_allele / ok_a / g_ad
    rows += cfg.gt_w
    rows += cfg.vout                      # output concat staging
    return rows * cfg.rt * cfg.bt * 4


def _vmem_budget_bytes() -> int:
    """Scoped-VMEM budget a candidate config must fit (bytes).  Mosaic's
    default scoped limit is 16M; keep headroom for temporaries the
    estimator does not model."""
    import os
    try:
        kb = int(os.environ.get("GENOMICSDB_TPU_FUSED_VMEM_KB", "14336"))
    except ValueError:
        kb = 14336
    return kb * 1024


# configs proven good/bad on this process's backend: maps a static
# config signature to True (compiled AND executed once) or False
# (compile or first execution failed — never retried).  A kernel
# failure therefore degrades to the next rt candidate / the XLA path
# instead of crashing the query (VERDICT r3 item 1).
_CFG_STATUS: Dict[tuple, bool] = {}


def _cfg_signature(cfg: FusedConfig, interpret: bool) -> tuple:
    import jax as _jax
    return (cfg, interpret, _jax.default_backend())


def make_fused_config(blk, *, max_merged: int, ploidy: int,
                      gt_phase: bool = False, rt: int = 0,
                      mixed: bool = False) -> FusedConfig:
    return FusedConfig(
        g_in=blk.pl.shape[2], g_out=len(K.genotype_combo_table(
            max_merged, ploidy)), a_in=blk.ad.shape[2], m=max_merged,
        gt_w=blk.gt.shape[2], f_med=blk.info_f.shape[0],
        f_imed=blk.info_i.shape[0], f_fsum=blk.info_fs.shape[0],
        ploidy=ploidy, gt_phase=gt_phase, rt=rt or _default_rt(),
        mixed=mixed)


def fused_host_prep(blk, cfg: FusedConfig, bpad_to: int = 0,
                    require_shared: bool = False):
    """Host-side (numpy) layout prep shared by the single-chip and
    mesh-sharded fused paths: pads records to a multiple of
    max(bpad_to, rt*bt), computes the window plan, and lays the block
    out in the kernel's [S, ...] shapes.  Returns None when the window
    premise fails (caller falls back to XLA)."""
    live = np.asarray(blk.live)
    B, S = live.shape
    unit = max(bpad_to, cfg.bt * cfg.rt)
    bpad = (-B) % unit
    del_rw = blk.del_rw if blk.del_rw is not None \
        else np.zeros((B, S), dtype=bool)
    has_nr = blk.rec_has_nr if blk.rec_has_nr is not None \
        else np.ones(B, dtype=bool)

    def padB(x, fill):
        return np.pad(x, [(0, bpad)] + [(0, 0)] * (x.ndim - 1),
                      constant_values=fill)

    live_p = padB(live, -1)
    C = blk.col.shape[1]
    cpad = (-C) % cfg.cb + cfg.cb          # room for the +1 window block
    # window plan: prefer the SHARED per-instance window (one ws-block
    # DMA set per grid instance) over per-sublane windows (2*rt DMAs)
    import dataclasses
    w0b = w2 = None
    if cfg.rt > 1:
        shared = fused_window_plan_shared(live_p, cfg,
                                          (C + cpad) // cfg.cb)
        if shared is not None:
            w2, ws_n = shared
            cfg = dataclasses.replace(cfg, ws=ws_n)
    if w2 is None:
        if require_shared:
            return None
        cfg = dataclasses.replace(cfg, ws=0)
        w0b = fused_window_plan(live_p, cfg)
        if w0b is None:
            return None
        if cfg.rt > 1:
            T = live_p.shape[0] // cfg.bt
            w2 = w0b.reshape(T // cfg.rt, cfg.rt, S)
    # the payload slab is a pure function of the store-wide dense
    # layout + the static config dims: cache it (host AND device) so
    # chunks / repeated queries upload it once
    lay = getattr(blk, "_dense_layout", None)
    pay = None
    if lay is not None:
        pkey = (cfg.g_in, cfg.a_in, cfg.gt_w, cfg.f_med, cfg.f_imed,
                cfg.f_fsum, cpad)
        pcache = lay.setdefault("_pay_cache", {})
        pay = pcache.get(pkey)
        if pay is None:
            import jax
            pay = jax.device_put(build_payload(blk, cfg, cpad))
            pcache[pkey] = pay
    if pay is None:
        pay = build_payload(blk, cfg, cpad)
    # per-chunk kernel inputs travel NARROW (upcast to int32 inside the
    # jit wrappers): allele indices/counts fit int8, live cell indices
    # fit int16 up to 32k cells/row — the chunk upload shrinks ~4x
    live_dt = np.int16 if C + cpad < 2**15 else np.int32
    live_t = np.ascontiguousarray(live_p.T).astype(live_dt)[:, None]
    inv_t = np.ascontiguousarray(
        np.moveaxis(padB(blk.inv_bs, -1), 0, 2)).astype(np.int8)
    nr_t = np.ascontiguousarray(
        padB(blk.nr_bs, -1).T).astype(np.int8)[:, None]
    recnm2 = padB(blk.rec_num_merged, 1)[None].astype(np.int8)
    recnr2 = padB(has_nr, True)[None].astype(np.int8)
    return {
        "pay": pay, "live_t": live_t, "inv_t": inv_t, "nr_t": nr_t,
        "recnm2": recnm2, "recnr2": recnr2, "w0b": w0b, "w2": w2,
        "cfg": cfg, "live_p": live_p, "del_rw_p": padB(del_rw, False),
    }


def _narrow_inputs_ok(blk) -> bool:
    """True when every PL/AD/GT input value fits the int16 narrow range
    (remaps are permutations + sentinels, so input range bounds output
    range).  Cached on the store-wide dense layout: the check scans the
    full slabs once, not per query."""
    lay = getattr(blk, "_dense_layout", None)
    if lay is not None and "_narrow_ok" in lay:
        return lay["_narrow_ok"]
    ok = True
    for arr in (blk.pl, blk.ad, blk.gt):
        a = np.asarray(arr)
        fits = (((a >= -32000) & (a <= 32000))
                | (a == INT_MISSING) | (a == formats.INT_VECTOR_END))
        if not fits.all():
            ok = False
            break
    if lay is not None:
        lay["_narrow_ok"] = ok
    return ok


def _narrow_scalars_ok(blk) -> bool:
    """True when the GQ/DP/MIN_DP payload values fit int16 (these rows
    are masked passthroughs, so input range bounds output range); the
    kernel then emits them in the int16 output with PACK_SPECS
    sentinels, and the pack step's re-narrow pass is skipped."""
    lay = getattr(blk, "_dense_layout", None)
    if lay is not None and "_narrow_scalars_ok" in lay:
        return lay["_narrow_scalars_ok"]
    ok = True
    for arr in (blk.gq, blk.dp, blk.min_dp):
        a = np.asarray(arr)
        fits = (((a >= -32000) & (a <= 32000))
                | (a == INT_MISSING) | (a == formats.INT_VECTOR_END))
        if not fits.all():
            ok = False
            break
    if lay is not None:
        lay["_narrow_scalars_ok"] = ok
    return ok


def combine_step_fused(blk, *, max_merged: int, ploidy: int,
                       gt_phase: bool = False,
                       interpret: bool = False,
                       rt: int = 0,
                       mixed_ploidy: bool = False,
                       med_rows=None,
                       narrow_out: bool = False):
    """combine_step built on the fused kernel.  Returns the same output
    dict, or None when the window premise fails for this block (caller
    falls back to the XLA path).  `rt` > 1 selects the sublane-packed
    kernel (rt*128 records per grid instance); 0 reads
    GENOMICSDB_TPU_FUSED_RT (default 8).  `mixed_ploidy` runs the
    per-call-ploidy variant (rt kernel only)."""
    from .combine_step import _reduce_math
    live = np.asarray(blk.live)
    B, S = live.shape
    if S == 0 or B == 0:
        return None
    if ploidy > 6:
        # past the reference's batched genotyping range
        # (variant_field_handler.cc:199-296 enumerates any ploidy; the
        # store path caps batching at 6 — ops/store_block.py)
        return None
    if max_merged > 16:
        # wide-allele blocks (multi-allelic hotspots merging up to the
        # 50-alt reference cap) take the XLA path: the fused kernel's
        # statically-unrolled remap selects stop paying past 16
        return None
    if mixed_ploidy and blk.gt_len_bs is None:
        return None
    cand = _rt_candidates(rt)
    budget = _vmem_budget_bytes()
    narrow = bool(narrow_out) and _narrow_inputs_ok(blk)
    for cand_rt in cand:
        if cand_rt >= 64 and B * 2 < cand_rt * 128:
            # an rt=64 instance covers 8192 records; don't pad a small
            # block past 2x its size when rt=32 serves it with less
            continue
        cfg = make_fused_config(blk, max_merged=max_merged,
                                ploidy=ploidy, gt_phase=gt_phase,
                                rt=cand_rt, mixed=mixed_ploidy)
        if narrow and cfg.rt > 1:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, narrow=True,
                narrow_scalars=_narrow_scalars_ok(blk))
        if mixed_ploidy and cfg.rt <= 1:
            continue
        if scoped_vmem_estimate(cfg) > budget:
            # this rt's per-instance temporaries would blow Mosaic's
            # scoped-VMEM limit — reject BEFORE paying a remote compile
            # that would fail (round-3 chip regression: mixed triploid
            # at auto-tried rt=32)
            continue
        # an auto-tried large rt must win its shared-window plan — at
        # rt=32 the per-sublane form would issue 64 window DMAs per
        # instance (strictly worse than rt=8)
        prep = fused_host_prep(blk, cfg, require_shared=cand_rt > 8)
        if prep is None:
            continue
        cfg = prep["cfg"]
        sig = _cfg_signature(cfg, interpret)
        if _CFG_STATUS.get(sig) is False:
            continue
        rt_n = cfg.rt
        pay, live_t, inv_t, nr_t = (prep["pay"], prep["live_t"],
                                    prep["inv_t"], prep["nr_t"])
        recnm2, recnr2 = prep["recnm2"], prep["recnr2"]
        live_p = prep["live_p"]
        try:
            if rt_n > 1:
                Bp = live_p.shape[0]
                T = Bp // cfg.bt
                gtl_rt = None
                if cfg.mixed:
                    bpad = Bp - B
                    gtl_p = np.pad(np.asarray(blk.gt_len_bs),
                                   ((0, bpad), (0, 0)),
                                   constant_values=0)
                    gtl_rt = np.ascontiguousarray(gtl_p.T).astype(
                        np.int8).reshape(S, T, cfg.bt)
                out = fused_gather_remap_rt(
                    pay, live_t[:, 0].reshape(S, T, cfg.bt),
                    inv_t.reshape(S, inv_t.shape[1], T, cfg.bt),
                    nr_t[:, 0].reshape(S, T, cfg.bt),
                    recnm2[0].reshape(T, cfg.bt),
                    recnr2[0].reshape(T, cfg.bt),
                    prep["w2"], gtl_rt, cfg=cfg,
                    interpret=interpret)
                if cfg.narrow:
                    out16 = out[0].reshape(S, cfg.vout16, Bp)
                    out = out[1].reshape(S, cfg.vout32, Bp)
                else:
                    out16 = None
                    out = out.reshape(S, cfg.vout, Bp)
            else:
                out16 = None
                out = fused_gather_remap(pay, live_t, inv_t, nr_t,
                                         recnm2, recnr2, prep["w0b"],
                                         cfg=cfg, interpret=interpret)
            if not interpret and _CFG_STATUS.get(sig) is not True:
                # prove the config once per process: block through
                # compile AND first execution so a deferred device
                # failure cannot escape this try (async dispatch)
                jax.block_until_ready(out)
                if out16 is not None:
                    jax.block_until_ready(out16)
                _CFG_STATUS[sig] = True
        except Exception:
            if interpret:
                # interpret mode backs the CPU test suite: a failure
                # there is a kernel bug, never a capacity limit — do
                # not mask it behind the XLA fallback
                raise
            _CFG_STATUS[sig] = False
            import warnings
            warnings.warn(
                f"fused kernel config rt={cfg.rt} ws={cfg.ws} "
                f"failed to compile/execute on "
                f"{jax.default_backend()}; degrading "
                f"(vmem estimate {scoped_vmem_estimate(cfg)}B)",
                RuntimeWarning)
            continue
        return _fused_post(out, prep["del_rw_p"], live_p, cfg, B,
                           _reduce_math, med_rows, out16)
    return None


@partial(jax.jit, static_argnames=("cfg", "b_real", "reduce_fn"))
def _fused_post(out, del_rw_p, live_p, cfg: FusedConfig, b_real: int,
                reduce_fn, med_rows=None, out16=None):
    """Split the stacked [S, Vout, Bpad] kernel output into the
    combine_step dict and run the XLA reductions.  In narrow mode `out`
    carries only the int32 scalar/INFO rows and `out16` the int16
    PL/AD/GT rows (BCF narrow sentinels baked in by the kernel)."""
    ro = cfg.out_rows32 if cfg.narrow else cfg.out_rows

    def rows(name):
        lo, hi = ro[name]
        return out[:, lo:hi, :]

    if cfg.narrow:
        ro16 = cfg.out_rows16

        def rows_v(name):
            lo, hi = ro16[name]
            return out16[:, lo:hi, :]
    else:
        rows_v = rows

    def to_bsx(x):                 # [S, W, Bp] -> [B, S, W]
        return jnp.transpose(x, (2, 0, 1))[:b_real]

    def to_bs(x):                  # [S, 1, Bp] -> [B, S]
        return jnp.transpose(x[:, 0, :], (1, 0))[:b_real]

    def to_fbs(x):                 # [S, F, Bp] -> [F, B, S]
        return jnp.transpose(x, (1, 2, 0))[:, :b_real]

    S_n = out.shape[0]
    if cfg.narrow_scalars:
        # GQ/DP/MIN_DP live in the int16 output (PACK_SPECS sentinels);
        # keep them narrow for the fetch pack and widen only the copies
        # the DP reduction consumes (fused into its reads)
        def wide16(x16):
            x = x16.astype(jnp.int32)
            x = jnp.where(x16 == jnp.int16(-32768),
                          jnp.int32(INT_MISSING), x)
            return jnp.where(x16 == jnp.int16(-32767),
                             jnp.int32(formats.INT_VECTOR_END), x)

        gq16 = to_bs(rows_v("gq"))
        dpf16 = to_bs(rows_v("dpf"))
        mdp16 = to_bs(rows_v("mdp"))
        gq, dpf, mdp = wide16(gq16), wide16(dpf16), wide16(mdp16)
    else:
        gq = to_bs(rows("gq"))
        dpf = to_bs(rows("dpf"))
        mdp = to_bs(rows("mdp"))
    dpi = to_bs(rows("dpi"))
    empty_f = jnp.zeros((0, b_real, S_n), jnp.float32)
    infog = jax.lax.bitcast_convert_type(to_fbs(rows("info_f")),
                                         jnp.float32) \
        if cfg.f_med else empty_f
    infoig = to_fbs(rows("info_i")) if cfg.f_imed else \
        jnp.zeros((0, b_real, S_n), jnp.int32)
    infofsg = jax.lax.bitcast_convert_type(to_fbs(rows("info_fs")),
                                           jnp.float32) \
        if cfg.f_fsum else empty_f
    # del_rw invalidation for INFO rows
    iok = ~del_rw_p[None, :b_real]                # [1, B, S]
    infog = jnp.where(iok, infog, jnp.nan) if cfg.f_med else infog
    infoig = jnp.where(iok, infoig, INT_MISSING) if cfg.f_imed else infoig
    infofsg = jnp.where(iok, infofsg, jnp.nan) if cfg.f_fsum else infofsg
    valid_b = (live_p >= 0)[:b_real]              # [B, S]
    if med_rows is not None:
        # restrict the INFO median/sum sorts to rows carrying any valid
        # input (meta.med_rows); the writer scatters the [F, Bv] result
        # back to full width with ok=False elsewhere — byte-identical
        infog = infog[:, med_rows]
        infoig = infoig[:, med_rows]
        infofsg = infofsg[:, med_rows]
        med_valid = valid_b[med_rows]
    else:
        med_valid = valid_b
    res = reduce_fn(gq, dpf, mdp, dpi, infog, infoig, infofsg,
                    med_valid)
    if cfg.narrow_scalars:
        # the widened copies above fed the DP math; the fetch pack
        # takes the kernel-narrowed rows directly (no re-narrow pass)
        res["gq"], res["dp_format"], res["min_dp"] = gq16, dpf16, mdp16
    res["pl"] = to_bsx(rows_v("pl"))
    res["ad"] = to_bsx(rows_v("ad"))
    res["gt"] = to_bsx(rows_v("gt"))
    res["live"] = jnp.asarray(live_p[:b_real], jnp.int32)
    return res


# ---------------------------------------------------------------------------
# Sublane-packed variant (rt record-sublanes x 128 record-lanes per grid
# instance).  The per-(tile, sample) kernel above runs 8192 grid instances
# per 8192x128 chunk with most vector ops on [1, 128] rows (1/8 of a vreg);
# on a v5e the grid+DMA floor alone measures ~1.25 ms/chunk.  Packing
# rt=8 sublanes of records per instance cuts instances 8x and runs the
# remap math on full [rt, 128] vregs ([G, rt, 128] for the combo stacks).
# The window premise is unchanged: each 128-record sublane still has its
# own scalar-prefetched 2x128-cell window (the plan is fused_window_plan's
# [T, S] array reshaped [T//rt, rt, S]), so the fallback rate is identical
# to the per-sample kernel.
# ---------------------------------------------------------------------------

def _make_kernel_rt(cfg: FusedConfig):
    r = cfg.rows
    rt = cfg.rt
    combos = K.genotype_combo_table(cfg.m, cfg.ploidy)     # [G_out, P]
    G = combos.shape[0]
    assert G == cfg.g_out
    max_allele = np.max(combos, axis=-1)                   # [G_out]
    VEC_END = int(formats.INT_VECTOR_END)
    # roofline diagnostic (docs/performance.md HBM-roofline section):
    # replace the per-sublane window gathers with a static slice —
    # WRONG results, isolates the lane-gather cost from DMA/math/writes
    import os as _os
    ablate_gather = _os.environ.get(
        "GENOMICSDB_TPU_FUSED_ABLATE_GATHER", "") not in ("", "0")

    n_win = cfg.ws if cfg.ws else 2 * rt

    def kernel(w2_ref, live_ref, inv_ref, nr_ref, recnm_ref, recnr_ref,
               *rest):
        if cfg.mixed:
            gtl_ref = rest[0]
            rest = rest[1:]
        win_refs = rest[:n_win]
        t = pl.program_id(0)
        s = pl.program_id(1)
        # index inputs travel NARROW (int8/int16, fused_host_prep) all
        # the way into VMEM — upcasting before the pallas_call would
        # quadruple their HBM read volume — and widen on read here
        live = live_ref[0].astype(jnp.int32)       # [rt, Bt]
        valid = live >= 0
        g_parts = []                               # per su: [V, Bt]
        if cfg.ws:
            # ONE ws-block window per instance, shared by all rt
            # sublanes (fused_window_plan_shared premise: the
            # instance's whole cell span fits in ws*Cb cells)
            base = w2_ref[t, s] * jnp.int32(cfg.cb)
            for su in range(rt):
                lv = live[su:su + 1]               # [1, Bt]
                rel = jnp.where(lv >= 0, lv - base, 0)
                if ablate_gather:
                    g_parts.append(win_refs[0][0, :, :cfg.bt]
                                   + rel.astype(jnp.int32))
                    continue
                acc = None
                for k in range(cfg.ws):
                    relk = jnp.minimum(
                        jnp.maximum(rel - jnp.int32(k * cfg.cb),
                                    jnp.int32(0)),
                        jnp.int32(cfg.cb - 1))
                    idxk = jnp.broadcast_to(relk, (cfg.v, cfg.bt))
                    gk = jnp.take_along_axis(win_refs[k][0], idxk,
                                             axis=-1)
                    if k == 0:
                        acc = gk
                    else:
                        in_k = jnp.broadcast_to(
                            rel >= jnp.int32(k * cfg.cb),
                            (cfg.v, cfg.bt))
                        acc = jnp.where(in_k, gk, acc)
                g_parts.append(acc)
        else:
            # per-sublane windowed gather: sublane su's 128 records
            # live in [base_su, base_su + 2*Cb) of the cell axis
            for su in range(rt):
                base = w2_ref[t, su, s] * jnp.int32(cfg.cb)
                lv = live[su:su + 1]                   # [1, Bt]
                rel = jnp.where(lv >= 0, lv - base, 0)
                relA = jnp.minimum(rel, jnp.int32(cfg.cb - 1))
                relB = jnp.minimum(jnp.maximum(rel - jnp.int32(cfg.cb),
                                               jnp.int32(0)),
                                   jnp.int32(cfg.cb - 1))
                idxA = jnp.broadcast_to(relA, (cfg.v, cfg.bt))
                idxB = jnp.broadcast_to(relB, (cfg.v, cfg.bt))
                gA = jnp.take_along_axis(win_refs[2 * su][0], idxA,
                                         axis=-1)
                gB = jnp.take_along_axis(win_refs[2 * su + 1][0], idxB,
                                         axis=-1)
                in_b = jnp.broadcast_to(rel >= jnp.int32(cfg.cb),
                                        (cfg.v, cfg.bt))
                g_parts.append(jnp.where(in_b, gB, gA))
        g3 = jnp.stack(g_parts, axis=1)            # [V, rt, Bt]
        inv = inv_ref[0].astype(jnp.int32)         # [M, rt, Bt]
        nr = nr_ref[0].astype(jnp.int32)           # [rt, Bt]
        recnm = recnm_ref[:].astype(jnp.int32)     # [rt, Bt]
        recnr = recnr_ref[:].astype(jnp.int32)     # [rt, Bt]
        nr_merged = jnp.where(recnr != 0, recnm - 1, -1)   # [rt, Bt]

        def row(name, i=0):
            lo, _ = r[name]
            return g3[lo + i]                      # [rt, Bt]

        # ---- PL genotype remap ----
        pll = row("pl_len")

        def pl_section(p_static):
            """[G_p, rt, Bt] remapped PL for static ploidy p_static
            (jax_kernels.remap_genotype_fields semantics)."""
            combos_p = K.genotype_combo_table(cfg.m, p_static)
            G_p = combos_p.shape[0]
            max_a = np.max(combos_p, axis=-1)
            slot_alleles = []
            combo_missing = [None] * G_p
            for p in range(p_static):
                rows_a = []
                for gi in range(G_p):
                    a = inv[combos_p[gi, p]]               # [rt, Bt]
                    a = jnp.where(a == -1,
                                  jnp.where(nr >= 0, nr, -1), a)
                    rows_a.append(a[None])
                    miss = jnp.where(a == -1, jnp.int32(1),
                                     jnp.int32(0))[None]
                    combo_missing[gi] = miss \
                        if combo_missing[gi] is None \
                        else jnp.maximum(combo_missing[gi], miss)
                slot_alleles.append(jnp.concatenate(rows_a, axis=0))
            cmiss = jnp.concatenate(combo_missing, axis=0) != 0
            slots = [jnp.maximum(a, 0) for a in slot_alleles]
            slots = K._sorting_network(slots)
            in_gt = jnp.zeros((G_p, rt, cfg.bt), jnp.int32)
            for i, a in enumerate(slots):
                in_gt = in_gt + _gt_index_term(a, i)
            ok = (~cmiss) & (in_gt < pll[None])
            in_rec = jnp.concatenate(
                [jnp.where(jnp.int32(int(max_a[gi])) < recnm,
                           jnp.int32(1), jnp.int32(0))[None]
                 for gi in range(G_p)], axis=0)
            ok = ok & (in_rec != 0)
            gathered = jnp.full((G_p, rt, cfg.bt), INT_MISSING,
                                jnp.int32)
            for k in range(cfg.g_in):
                gathered = jnp.where(in_gt == jnp.int32(k),
                                     row("pl", k)[None], gathered)
            return jnp.where(ok, gathered, INT_MISSING)

        if cfg.mixed:
            gtl = gtl_ref[0].astype(jnp.int32)             # [rt, Bt]
            ploidy_rs = (gtl + 1) // 2 if cfg.gt_phase else gtl
            pl_out = jnp.full((G, rt, cfg.bt), VEC_END, jnp.int32)
            for p_s in range(1, cfg.ploidy + 1):
                v = pl_section(p_s)
                G_p = v.shape[0]
                if G_p < G:
                    v = jnp.concatenate(
                        [v, jnp.full((G - G_p, rt, cfg.bt), VEC_END,
                                     jnp.int32)], axis=0)
                pl_out = jnp.where(ploidy_rs[None] == jnp.int32(p_s),
                                   v, pl_out)
        else:
            pl_out = pl_section(cfg.ploidy)

        # ---- AD allele remap ----
        adl = row("ad_len")
        in_allele = jnp.where(inv == -1,
                              jnp.where(nr >= 0, nr, -1)[None],
                              inv)                         # [M, rt, Bt]
        ok_a = (in_allele != -1) & (in_allele >= 0) \
            & (in_allele < adl[None])
        m_iota = jax.lax.broadcasted_iota(jnp.int32,
                                          (cfg.m, rt, cfg.bt), 0)
        ok_a = ok_a & (m_iota < recnm[None])
        g_ad = jnp.full((cfg.m, rt, cfg.bt), INT_MISSING, jnp.int32)
        for k in range(cfg.a_in):
            g_ad = jnp.where(in_allele == jnp.int32(k),
                             row("ad", k)[None], g_ad)
        ad_out = jnp.where(ok_a, g_ad, INT_MISSING)

        # ---- GT remap ----
        gt_rows = []
        for p in range(cfg.gt_w):
            a = row("gt", p)
            a = jnp.where(valid, a, INT_MISSING)
            if cfg.gt_phase and p % 2 == 1:
                out_p = a
            else:
                merged = jnp.full((rt, cfg.bt), -1, jnp.int32)
                for mi in range(cfg.m):
                    merged = jnp.where(inv[mi] == a, mi, merged)
                okg = (a >= 0) & (a != INT_MISSING)
                out_p = jnp.where(
                    okg, jnp.where(merged >= 0, merged, nr_merged), a)
            if cfg.mixed:
                # slots past the call's stored GT length are VECTOR_END
                # (gt_remap_unrolled's variable-ploidy rule)
                out_p = jnp.where(jnp.int32(p) < gtl, out_p,
                                  jnp.int32(VEC_END))
            gt_rows.append(out_p[None])
        gt_out = jnp.concatenate(gt_rows, axis=0)

        # ---- passthrough scalars + INFO rows ----
        NAN_BITS = jnp.int32(np.int32(np.float32(np.nan).view(np.int32)))

        def masked(name, i=0, fl=False):
            fill = NAN_BITS if fl else jnp.int32(INT_MISSING)
            return jnp.where(valid, row(name, i), fill)[None]

        narrow16 = [masked("gq"), masked("dpf"), masked("mdp")] \
            if cfg.narrow_scalars else []
        scalars = [] if cfg.narrow_scalars \
            else [masked("gq"), masked("dpf"), masked("mdp")]
        scalars.append(masked("dpi"))
        for blkname, n, fl in (("info_f", cfg.f_med, True),
                               ("info_i", cfg.f_imed, False),
                               ("info_fs", cfg.f_fsum, True)):
            for i in range(n):
                scalars.append(masked(blkname, i, fl))
        if cfg.narrow:
            # the BCF narrow sentinels baked in: -32768 = missing,
            # -32767 = vector-end (the host proved value ranges fit)
            def to16(x):
                y = jnp.where(x == jnp.int32(INT_MISSING),
                              jnp.int32(-32768),
                              jnp.where(x == jnp.int32(VEC_END),
                                        jnp.int32(-32767), x))
                return y.astype(jnp.int16)

            out16_ref = rest[n_win]
            out32_ref = rest[n_win + 1]
            out16_ref[0] = to16(
                jnp.concatenate([pl_out, ad_out, gt_out] + narrow16,
                                axis=0))
            out32_ref[0] = jnp.concatenate(scalars, axis=0)
        else:
            out_ref = rest[n_win]
            out_ref[0] = jnp.concatenate(
                [pl_out, ad_out, gt_out] + scalars, axis=0)

    return kernel


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_gather_remap_rt(payload, live_rt, inv_rt, nr_rt, recnm_rt,
                          recnr_rt, w2, gtl_rt=None, *, cfg: FusedConfig,
                          interpret: bool = False):
    """Sublane-packed launch: payload [S, V, Cpad]; live_rt/nr_rt
    [S, T, Bt]; inv_rt [S, M, T, Bt]; recnm_rt/recnr_rt [T, Bt]; w2
    [T//rt, rt, S] (fused_window_plan reshaped) or, when cfg.ws > 0,
    [T//rt, S] shared bases (fused_window_plan_shared); gtl_rt
    [S, T, Bt] per-call GT lengths (required when cfg.mixed).  Returns
    [S, Vout, T, Bt] — reshape(S, Vout, T*Bt) recovers the per-sample
    kernel's layout exactly."""
    rt = cfg.rt
    S = payload.shape[0]
    T = live_rt.shape[1]
    T2 = T // rt
    # per-chunk inputs may arrive narrowed (int8/int16) to cut the
    # host->device upload; the kernel reads them narrow (int8/int16
    # block DMAs) and widens in VMEM — upcasting here would 4x their
    # HBM read volume
    kernel = _make_kernel_rt(cfg)
    if cfg.ws:
        win_specs = [
            pl.BlockSpec((1, cfg.v, cfg.cb),
                         (lambda t, s, w, k=k: (s, 0, w[t, s] + k)))
            for k in range(cfg.ws)
        ]
    else:
        win_specs = [
            pl.BlockSpec((1, cfg.v, cfg.cb),
                         (lambda t, s, w, su=su, k=k:
                          (s, 0, w[t, su, s] + k)))
            for su in range(rt) for k in (0, 1)
        ]
    n_win = cfg.ws if cfg.ws else 2 * rt
    gtl_specs = [pl.BlockSpec((1, rt, cfg.bt),
                              lambda t, s, w: (s, t, 0))] \
        if cfg.mixed else []
    if cfg.narrow:
        out_specs = [
            pl.BlockSpec((1, cfg.vout16, rt, cfg.bt),
                         lambda t, s, w: (s, 0, t, 0)),
            pl.BlockSpec((1, cfg.vout32, rt, cfg.bt),
                         lambda t, s, w: (s, 0, t, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((S, cfg.vout16, T, cfg.bt), jnp.int16),
            jax.ShapeDtypeStruct((S, cfg.vout32, T, cfg.bt), jnp.int32),
        ]
    else:
        out_specs = pl.BlockSpec((1, cfg.vout, rt, cfg.bt),
                                 lambda t, s, w: (s, 0, t, 0))
        out_shape = jax.ShapeDtypeStruct((S, cfg.vout, T, cfg.bt),
                                         jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T2, S),
        in_specs=[
            pl.BlockSpec((1, rt, cfg.bt), lambda t, s, w: (s, t, 0)),
            pl.BlockSpec((1, cfg.m, rt, cfg.bt),
                         lambda t, s, w: (s, 0, t, 0)),
            pl.BlockSpec((1, rt, cfg.bt), lambda t, s, w: (s, t, 0)),
            pl.BlockSpec((rt, cfg.bt), lambda t, s, w: (t, 0)),
            pl.BlockSpec((rt, cfg.bt), lambda t, s, w: (t, 0)),
        ] + gtl_specs + win_specs,
        out_specs=out_specs,
    )
    gtl_args = (gtl_rt,) if cfg.mixed else ()
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(w2, live_rt, inv_rt, nr_rt, recnm_rt, recnr_rt, *gtl_args,
          *([payload] * n_win))
