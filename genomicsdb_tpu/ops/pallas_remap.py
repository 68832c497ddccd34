"""Pallas TPU kernel: fused genotype-remap gather.

The hot inner op of the combine is the PL reorder: for every
(record, sample) pair, gather G output genotype values from the call's
input PL vector at precomputed indices, masked by validity
(ops/jax_kernels.py remap_genotype_fields, the batched equivalent of
variant_field_handler.cc:84-296).

This kernel fuses the gather + validity select in VMEM with the gathered
axis on lanes (Mosaic supports take_along_axis along the lane dimension).
Rows = flattened (record, sample) pairs; lanes = genotype axis padded
to 128.  Validated against the XLA path in tests/test_pallas_remap.py
(interpret mode on CPU; compiled on the real chip).
"""

from __future__ import annotations

import sys
from functools import partial

import jax

# Mosaic lowering of the gather kernel recurses deeply during tracing;
# the default 1000-frame limit aborts the compile.
if sys.getrecursionlimit() < 100000:
    sys.setrecursionlimit(100000)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import formats

INT_MISSING = formats.INT_MISSING
LANE = 128
BLK = 256


def _remap_kernel(values_ref, idx_ref, ok_ref, out_ref):
    vals = values_ref[:]
    # NOTE: jnp.clip with Python-int bounds loops in ufunc dispatch under
    # x64 inside Mosaic tracing; use typed min/max instead.
    idx = jnp.minimum(jnp.maximum(idx_ref[:], jnp.int32(0)),
                      jnp.int32(LANE - 1))
    gathered = jnp.take_along_axis(vals, idx, axis=-1)
    out_ref[:] = jnp.where(ok_ref[:] != 0, gathered,
                           jnp.int32(INT_MISSING))


@partial(jax.jit, static_argnames=("interpret",))
def remap_gather_pallas(values: jnp.ndarray, in_gt: jnp.ndarray,
                        ok: jnp.ndarray, interpret: bool = False
                        ) -> jnp.ndarray:
    """Fused masked lane-gather.

    values: [R, S, Kv] int32 (source vectors)
    in_gt:  [R, S, Ko] gather indices into the Kv axis
    ok:     [R, S, Ko] bool validity
    Returns [R, S, Ko]; invalid -> INT_MISSING.
    """
    R, S, Kv = values.shape
    Ko = in_gt.shape[-1]
    rows = R * S
    pad_rows = (-rows) % BLK
    values = jnp.asarray(values, dtype=jnp.int32)
    in_gt = jnp.asarray(in_gt, dtype=jnp.int32)
    ok = jnp.asarray(ok, dtype=jnp.int32)
    v2 = jnp.pad(values.reshape(rows, Kv),
                 ((0, pad_rows), (0, LANE - Kv)),
                 constant_values=INT_MISSING)
    i2 = jnp.pad(in_gt.reshape(rows, Ko), ((0, pad_rows), (0, LANE - Ko)))
    o2 = jnp.pad(ok.reshape(rows, Ko), ((0, pad_rows), (0, LANE - Ko)))
    n_rows = rows + pad_rows
    # Mosaic rejects the 64-bit index iota jax_enable_x64 injects into
    # take_along_axis lowering; trace the kernel in 32-bit scope.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _remap_kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANE), jnp.int32),
            grid=(n_rows // BLK,),
            in_specs=[pl.BlockSpec((BLK, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((BLK, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v2, i2, o2)
    return out[:rows, :Ko].reshape(R, S, Ko)


def remap_genotype_fields_pallas(values, inv_lut, in_len, input_nr,
                                 num_merged, num_merged_alleles: int,
                                 ploidy: int, interpret: bool = False):
    """Drop-in for jax_kernels.remap_genotype_fields with the gather+mask
    stage as a Pallas kernel."""
    from . import jax_kernels as K

    combos = K.genotype_combo_table(num_merged_alleles, ploidy)
    ncr = jnp.asarray(K.ncr_table(num_merged_alleles + ploidy + 2))
    G = combos.shape[0]
    nr = input_nr[..., None]
    slot_alleles = []
    combo_missing = jnp.zeros(inv_lut.shape[:2] + (G,), dtype=bool)
    for p in range(ploidy):
        a = inv_lut[..., combos[:, p]]
        a = jnp.where(a == -1, jnp.where(nr >= 0, nr, -1), a)
        combo_missing = combo_missing | (a == -1)
        slot_alleles.append(jnp.maximum(a, 0))
    sorted_slots = K._sorting_network(slot_alleles)
    in_gt = jnp.zeros_like(sorted_slots[0])
    for i, a in enumerate(sorted_slots):
        in_gt = in_gt + ncr[i + a, a]
    ok = (~combo_missing) & (in_gt < in_len[..., None])
    max_allele = np.max(combos, axis=-1)
    in_record = jnp.asarray(max_allele)[None, :] < num_merged[:, None]
    ok = ok & in_record[:, None, :]
    return remap_gather_pallas(values, in_gt, ok, interpret=interpret)
