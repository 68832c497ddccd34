"""Row-restricted INFO median/sum reductions == full-width reductions.

The combine restricts its cross-sample sorts to meta.med_rows (rows
carrying any valid median/sum input — reference semantics compute
medians from valid inputs only, variant_field_handler.cc:530-560, so
rows with no valid input produce ok=False either way).  Pin (a) the
restriction triggers on a gVCF-shaped cohort (ref bands carry no
RankSum), (b) the query text is byte-identical with the restriction
forced OFF.
"""

import os

import numpy as np
import pytest

from golden_utils import REF_TESTS
from test_block_writer import _make_cohort

from genomicsdb_tpu.core.config import QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.ops.store_block import store_to_block
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store.import_pipeline import import_callsets


@pytest.fixture(scope="module")
def cohort_store(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("medrows")
    path, samples, region = _make_cohort(tmp, n_samples=9,
                                         n_records=300,
                                         with_deletions=True)
    vid = VidMapper.from_files(os.path.join(REF_TESTS,
                                            "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    return import_callsets(vid), vid, region


def test_med_rows_sparse_on_gvcf(cohort_store):
    store, vid, region = cohort_store
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    blk, meta = store_to_block(store, qc, interval=(0, region + 10),
                               return_meta=True)
    B = blk.live.shape[0]
    assert meta.med_rows is not None
    # the cohort's BaseQRankSum/MQ0 live on variant records only —
    # the restriction must be a strict subset of rows
    assert 0 < len(meta.med_rows) < B
    # and a superset of rows whose INFO medians could be valid
    assert (np.diff(meta.med_rows) > 0).all()


def test_restricted_equals_full_text(cohort_store, monkeypatch):
    store, vid, region = cohort_store
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []

    qc = driver.make_query_config(qp, vid)
    restricted = driver.run_vcf_query_block(store, qc, qp, vid)

    # force the restriction off by blanking med_rows in the meta
    import genomicsdb_tpu.query.block_writer as BW
    orig = BW.store_to_block

    def no_restrict(*a, **k):
        r = orig(*a, **k)
        if isinstance(r, tuple):
            r[1].med_rows = None
        return r

    monkeypatch.setattr(BW, "store_to_block", no_restrict)
    qc2 = driver.make_query_config(qp, vid)
    full = driver.run_vcf_query_block(store, qc2, qp, vid)
    assert restricted == full
