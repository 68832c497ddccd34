"""Materialized serving index == live engine, byte-exact, on random
intervals over deletion-heavy cohorts (the GATK/Spark split-serving
pattern, spark/GenomicsDBInputFormat.java:65)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_property_random import (VID_DOC, _random_deletion_store,
                                  _random_store)

from genomicsdb_tpu.core.config import QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver, serving_index
from genomicsdb_tpu.query.stream import CombinedRecordStream


def _vid():
    vid = VidMapper()
    vid.parse_vid(VID_DOC)
    vid.parse_callsets({"callsets": {
        f"S{r}": {"row_idx": r, "idx_in_file": r, "filename": "x"}
        for r in range(6)}})
    return vid


def _bcf_bytes(store, vid, interval, produce_gt=False, use_index=False,
               monkeypatch=None):
    qp = QueryParams()
    qp.column_ranges = [[interval]]
    qp.produce_GT_field = produce_gt
    qc = driver.make_query_config(qp, vid)
    if use_index:
        # force an immediate build on this fresh stream
        stream = CombinedRecordStream(store, qc, qp, vid, engine="block")
        return b"".join(stream.bcf_stream())
    # index disabled: live engine
    monkeypatch.setenv("GENOMICSDB_TPU_SERVING_INDEX", "0")
    try:
        stream = CombinedRecordStream(store, qc, qp, vid, engine="block")
        return b"".join(stream.bcf_stream())
    finally:
        monkeypatch.delenv("GENOMICSDB_TPU_SERVING_INDEX")


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("deletions", [False, True])
def test_serving_index_equals_engine(seed, deletions, monkeypatch):
    monkeypatch.setattr(serving_index, "BUILD_AFTER_QUERIES", 1)
    rng = np.random.default_rng(seed)
    vid = _vid()
    store = (_random_deletion_store(vid, rng) if deletions
             else _random_store(vid, rng))
    import random
    r = random.Random(seed)
    span = int(store.eff_end.max()) + 10
    # interval shapes: tiny, mid, cell-boundary-straddling, full
    ivs = [(0, span)]
    for _ in range(12):
        lo = r.randint(0, span)
        ivs.append((lo, lo + r.choice([0, 1, 3, 17, 60, 200])))
    # straddle actual cell boundaries (clipping paths)
    for ci in range(0, store.num_cells, max(1, store.num_cells // 6)):
        c, e = int(store.col[ci]), int(store.eff_end[ci])
        ivs.append((max(0, c - 1), max(0, c - 1)))
        ivs.append((c, max(c, e - 1)))
        ivs.append(((c + e) // 2, e + 3))
    for produce_gt in (False, True):
        for iv in ivs:
            want = _bcf_bytes(store, vid, iv, produce_gt,
                              monkeypatch=monkeypatch)
            got = _bcf_bytes(store, vid, iv, produce_gt, use_index=True)
            assert got == want, (iv, produce_gt)


def test_serving_index_builds_after_repeat(monkeypatch):
    """The index builds on the 2nd query of one signature and is then
    attached to the store."""
    rng = np.random.default_rng(7)
    vid = _vid()
    store = _random_store(vid, rng)
    qp = QueryParams()
    qp.column_ranges = [[(0, 10_000)]]
    qc = driver.make_query_config(qp, vid)
    s1 = CombinedRecordStream(store, qc, qp, vid, engine="block")
    b1 = b"".join(s1.bcf_stream())
    assert all(e[1] is None
               for e in store._serving_idx_cache.values())
    s2 = CombinedRecordStream(store, qc, qp, vid, engine="block")
    b2 = b"".join(s2.bcf_stream())
    assert b2 == b1
    assert any(e[1] is not None
               for e in store._serving_idx_cache.values())
    s3 = CombinedRecordStream(store, qc, qp, vid, engine="block")
    assert b"".join(s3.bcf_stream()) == b1


@pytest.mark.parametrize("seed", [0, 2])
def test_serving_index_text_path_equals_engine(seed, monkeypatch):
    """driver.run_vcf_query_block (the text path) serves from the index
    after repeat queries — byte-identical to the live engine."""
    monkeypatch.setattr(serving_index, "BUILD_AFTER_QUERIES", 1)
    rng = np.random.default_rng(seed)
    vid = _vid()
    store = _random_deletion_store(vid, rng)
    import random
    r = random.Random(seed)
    span = int(store.eff_end.max()) + 10

    def text(iv, use_index):
        if not use_index:
            monkeypatch.setenv("GENOMICSDB_TPU_SERVING_INDEX", "0")
        try:
            qp = QueryParams()
            qp.column_ranges = [[iv]]
            qc = driver.make_query_config(qp, vid)
            return driver.run_vcf_query_block(store, qc, qp, vid)
        finally:
            if not use_index:
                monkeypatch.delenv("GENOMICSDB_TPU_SERVING_INDEX")

    for _ in range(10):
        lo = r.randint(0, span)
        iv = (lo, lo + r.choice([0, 2, 25, 120]))
        assert text(iv, True) == text(iv, False), iv
    # full-range and paged equivalents keep matching through serving
    assert text((0, span), True) == text((0, span), False)


def test_serving_index_multi_interval_and_row_subsets(monkeypatch):
    """Multi-interval queries serve per interval; different row subsets
    key different indexes; bytes equal the engine in all cases."""
    monkeypatch.setattr(serving_index, "BUILD_AFTER_QUERIES", 1)
    rng = np.random.default_rng(5)
    vid = _vid()
    store = _random_deletion_store(vid, rng)
    span = int(store.eff_end.max()) + 10

    def run(row_hi, ivs, use_index):
        if not use_index:
            monkeypatch.setenv("GENOMICSDB_TPU_SERVING_INDEX", "0")
        try:
            qp = QueryParams()
            qp.column_ranges = [list(ivs)]
            qp.row_ranges = [[(0, row_hi)]]
            qc = driver.make_query_config(qp, vid)
            s = CombinedRecordStream(store, qc, qp, vid,
                                     engine="block")
            return b"".join(s.bcf_stream())
        finally:
            if not use_index:
                monkeypatch.delenv("GENOMICSDB_TPU_SERVING_INDEX")

    ivs = [(0, span // 3), (span // 2, span // 2 + 40),
           (span - 50, span)]
    for row_hi in (5, 2):
        want = run(row_hi, ivs, False)
        run(row_hi, ivs, True)          # counts + builds
        got = run(row_hi, ivs, True)    # served
        assert got == want, row_hi
    # the two row subsets produced distinct cache entries
    assert len(store._serving_idx_cache) == 2


def test_serving_index_respects_cell_cap(monkeypatch):
    monkeypatch.setenv("GENOMICSDB_TPU_SERVING_CACHE_CELLS", "1")
    rng = np.random.default_rng(3)
    vid = _vid()
    store = _random_store(vid, rng)
    qp = QueryParams()
    qp.column_ranges = [[(0, 10_000)]]
    qc = driver.make_query_config(qp, vid)
    for _ in range(3):
        s = CombinedRecordStream(store, qc, qp, vid, engine="block")
        b"".join(s.bcf_stream())
    assert not getattr(store, "_serving_idx_cache", None)


def test_patched_edges_serve_without_engine(monkeypatch):
    """Boundary-clipped pure-<NON_REF> records serve through the
    index-text PATCH path (ServingIndex._patched_line) — not the
    engine fallback — including the reference-genome REF substitution
    at a shifted head (vcf_writer.py:498-502 semantics), byte-equal to
    the live engine on the golden t0_1_2 cohort."""
    import golden_utils as gu
    monkeypatch.setattr(serving_index, "BUILD_AFTER_QUERIES", 1)
    vid, store = gu.load_setup("inputs/callsets/t0_1_2.json")
    ref = os.path.join(gu.REF_TESTS, "inputs/chr1_10MB.fasta.gz")
    hits = {"n": 0, "ref": 0, "engine": 0}
    orig_patch = serving_index.ServingIndex._patched_line
    orig_engine = serving_index.engine_record_lines

    def spy_patch(self, i, nl, nh, ref_base):
        out = orig_patch(self, i, nl, nh, ref_base)
        if out is not None:
            hits["n"] += 1
            if nl is not None and ref_base is not None:
                hits["ref"] += 1
        return out

    def spy_engine(*a, **kw):
        hits["engine"] += 1
        return orig_engine(*a, **kw)

    monkeypatch.setattr(serving_index.ServingIndex, "_patched_line",
                        spy_patch)
    monkeypatch.setattr(serving_index, "engine_record_lines",
                        spy_engine)

    def q(iv, use_index):
        if not use_index:
            monkeypatch.setenv("GENOMICSDB_TPU_SERVING_INDEX", "0")
        try:
            qp = QueryParams()
            qp.column_ranges = [[iv]]
            qc = driver.make_query_config(qp, vid)
            return driver.run_vcf_query_block(store, qc, qp, vid,
                                              reference_path=ref)
        finally:
            if not use_index:
                monkeypatch.delenv("GENOMICSDB_TPU_SERVING_INDEX")

    # boundaries strictly inside t0_1_2's gVCF ref blocks: each query
    # head-clips a block => POS shift + reference-base REF patch
    spans = sorted({(int(c), int(e))
                    for c, e in zip(store.col, store.eff_end)
                    if e - c > 4})
    assert len(spans) >= 2
    for c, e in spans[:3]:
        iv = (c + 2, c + 2 + 300)
        want = q(iv, False)
        got = q(iv, True)
        assert got == want, iv
    assert hits["n"] >= 1, "no boundary served through the patch path"
    assert hits["ref"] >= 1, "no reference-base head patch exercised"
    assert hits["engine"] == 0, \
        "engine fallback fired on pure-<NON_REF> boundaries"


def test_patched_tail_and_1bp_collapse(monkeypatch):
    """Tail clips rewrite INFO END; a clip collapsing a block to one
    position drops END entirely (vcf_writer.py:526 renders END only
    when end > start).  Byte-equal to the engine either way."""
    import golden_utils as gu
    monkeypatch.setattr(serving_index, "BUILD_AFTER_QUERIES", 1)
    vid, store = gu.load_setup("inputs/callsets/t0_1_2.json")

    def q(iv, use_index):
        if not use_index:
            monkeypatch.setenv("GENOMICSDB_TPU_SERVING_INDEX", "0")
        try:
            qp = QueryParams()
            qp.column_ranges = [[iv]]
            qc = driver.make_query_config(qp, vid)
            return driver.run_vcf_query_block(store, qc, qp, vid)
        finally:
            if not use_index:
                monkeypatch.delenv("GENOMICSDB_TPU_SERVING_INDEX")

    # pick a long ref block from the store itself and clip inside it
    spans = [(int(c), int(e)) for c, e in zip(store.col, store.eff_end)
             if e - c > 10]
    assert spans
    c, e = spans[0]
    mid = (c + e) // 2
    # tail clip: END rewritten to the query end
    iv = (max(0, c - 5), mid)
    assert q(iv, True) == q(iv, False), iv
    # 1-bp query inside the block: END= must vanish from INFO
    got = q((mid, mid), True)
    want = q((mid, mid), False)
    assert got == want
    rec = [ln for ln in got.splitlines() if ln and not
           ln.startswith("#")]
    assert rec and "END=" not in rec[0].split("\t")[7]
