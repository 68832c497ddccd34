"""Device->host fetch compaction (combine_step.pack_outputs):
narrowed int16/int8 output fetches must be lossless, with int32
fallback on genuine overflow, and the packed block engine must stay
byte-identical end-to-end."""

import os

import numpy as np
import pytest

from golden_utils import REF_TESTS
from test_block_writer import _make_cohort

from genomicsdb_tpu.core import formats
from genomicsdb_tpu.core.config import QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.ops.combine_step import (PACK_SPECS, fetch_outputs,
                                             pack_outputs)
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store.import_pipeline import import_callsets


def test_pack_roundtrip_lossless():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    pl = rng.integers(-30000, 30000, size=(7, 5, 10)).astype(np.int32)
    pl[0, 0, 0] = formats.INT_MISSING
    pl[1, 2, 3] = formats.INT_VECTOR_END
    gt = rng.integers(-1, 51, size=(7, 5, 3)).astype(np.int32)
    gt[2, 1, 1] = formats.INT_MISSING
    out = {"pl": jnp.asarray(pl), "gt": jnp.asarray(gt)}
    packed = pack_outputs(out)
    # one-round-trip blob form: fits flags + narrowed data inside
    from genomicsdb_tpu.ops.combine_step import _unpack_blob
    parts = _unpack_blob(np.asarray(packed["__blob__"]),
                         packed["__layout__"])
    assert bool(parts["fits::pl"][0]) and bool(parts["fits::gt"][0])
    assert parts["data::pl"].dtype == np.int16
    assert parts["data::gt"].dtype == np.int8
    dev = fetch_outputs(out, packed)
    assert np.array_equal(dev["pl"], pl)
    assert np.array_equal(dev["gt"], gt)


def test_pack_overflow_falls_back_to_int32():
    import jax.numpy as jnp
    pl = np.full((3, 2, 4), 123, dtype=np.int32)
    pl[1, 1, 1] = 1_000_000          # beyond int16
    out = {"pl": jnp.asarray(pl)}
    packed = pack_outputs(out)
    from genomicsdb_tpu.ops.combine_step import _unpack_blob
    parts = _unpack_blob(np.asarray(packed["__blob__"]),
                         packed["__layout__"])
    assert not bool(parts["fits::pl"][0])
    dev = fetch_outputs(out, packed)
    assert np.array_equal(dev["pl"], pl)


def test_split_fetch_matches_full_fetch(tmp_path):
    """Variant-row-only fetch + host identity reconstruction must equal
    the full device fetch at every LIVE cell (ref rows are identity
    remaps; non-live cells are never read by the renderer)."""
    from genomicsdb_tpu.ops.combine_step import (block_to_args,
                                                 combine_step,
                                                 fetch_outputs_split,
                                                 host_identity_outputs)
    from genomicsdb_tpu.ops.store_block import store_to_block
    path, samples, region = _make_cohort(tmp_path, n_samples=5,
                                         n_records=80,
                                         with_deletions=True)
    vid = VidMapper.from_files(os.path.join(REF_TESTS,
                                            "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    blk, meta = store_to_block(store, qc, interval=(0, region + 10),
                               return_meta=True)
    out = combine_step(*block_to_args(blk),
                       max_merged=blk.inv_bs.shape[2],
                       ploidy=blk.ploidy,
                       gt_phase=meta.plan.gt_phase)
    full = fetch_outputs(dict(out))
    var_rows = np.nonzero(~meta.is_ref_block_only)[0]
    ref_rows = np.nonzero(meta.is_ref_block_only)[0]
    assert len(ref_rows) > 10 and len(var_rows) > 3
    widths = (out["pl"].shape[-1], out["ad"].shape[-1],
              out["gt"].shape[-1])
    ident = host_identity_outputs(blk, ref_rows, widths,
                                  meta.plan.gt_phase, False)
    packed = pack_outputs(out, rows=var_rows)
    dev = fetch_outputs_split(out, packed, var_rows, ref_rows, ident)
    live_ok = np.asarray(blk.live) >= 0
    for k in ("pl", "ad", "gt"):
        a, b = full[k], dev[k]
        assert np.array_equal(a[live_ok], b[live_ok]), k
    for k in ("gq", "dp_format", "min_dp"):
        assert np.array_equal(full[k], dev[k]), k


def test_packed_block_engine_byte_identical(tmp_path, monkeypatch):
    """GENOMICSDB_TPU_PACK=1 (forced on CPU): block output unchanged."""
    path, samples, region = _make_cohort(tmp_path, n_samples=6,
                                         n_records=90,
                                         with_deletions=True)
    vid = VidMapper.from_files(os.path.join(REF_TESTS,
                                            "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    monkeypatch.setenv("GENOMICSDB_TPU_PACK", "0")
    plain = driver.run_vcf_query_block(store, qc, qp, vid)
    monkeypatch.setenv("GENOMICSDB_TPU_PACK", "1")
    qc2 = driver.make_query_config(qp, vid)
    packed = driver.run_vcf_query_block(store, qc2, qp, vid)
    assert packed == plain
