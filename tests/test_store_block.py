"""Real store -> device block -> combine step vs the sequential engine."""

import numpy as np

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, load_setup,
                          make_query_params)

from genomicsdb_tpu.core import formats
from genomicsdb_tpu.ops.combine_step import block_to_args, combine_step
from genomicsdb_tpu.ops.store_block import store_to_block
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.query.scan import scan_variants

INT_MISSING = formats.INT_MISSING


def test_store_block_combine_matches_sequential():
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    blk = store_to_block(store, qc, interval=(12140, 20000),
                         max_merged=4, ploidy=2)
    out = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    starts = blk.starts
    live = np.asarray(out["live"])
    pl = np.asarray(out["pl"])
    ad = np.asarray(out["ad"])
    dp_sum = np.asarray(out["dp_info_sum"])
    med = np.asarray(out["info_median"])
    # sequential engine records for the same interval
    seq = {}
    for v in scan_variants(store, qc, (12140, 20000)):
        seq[v.start] = v
    b_by_start = {int(s): i for i, s in enumerate(starts)}
    # the multi-allelic site at column 17384 (VCF 17385)
    b = b_by_start[17384]
    v = seq[17384]
    # merged alleles G -> [A, T, NON_REF]: row0 PL remap must equal golden
    expect_pl0 = [504, 0, 9807, 678, 1870, 2548, 678, 1870, 2548, 2548]
    assert pl[b, 0, :10].tolist() == expect_pl0
    expect_pl1 = [3336, 4536, 7349, 358, 958, 0, 4536, 7349, 958, 7349]
    assert pl[b, 1, :10].tolist() == expect_pl1
    assert ad[b, 0, :4].tolist() == [58, 22, 17, 17]
    assert ad[b, 1, :4].tolist() == [0, 37, 120, 37]
    assert ad[b, 2, :4].tolist() == [40, 36, 0, 0]
    # INFO DP = 276 (golden)
    assert dp_sum[b] == 276
    # median of MQ over valid calls = 31.72 (golden); slot via the plan
    from genomicsdb_tpu.query.block_fields import build_block_plan
    plan = build_block_plan(qc, vid)
    mq_med = med[plan.med_fields.index("MQ"), b]
    assert abs(float(mq_med) - 31.72) < 1e-4
    # ref-block intervals: live rows match the sequential engine
    for start, v in seq.items():
        if start not in b_by_start:
            continue
        bi = b_by_start[start]
        seq_live_rows = {qidx for qidx, _ in v.valid_calls()}
        blk_live_rows = {s for s in range(3) if live[bi, s] >= 0}
        assert blk_live_rows == seq_live_rows, start


def test_record_starts_cache_consistency():
    """The store-cached event set must give identical record_starts for
    any interval as a fresh computation (repeated small-interval
    queries hit the cache; Spark/GATK split pattern)."""
    import numpy as np
    from genomicsdb_tpu.ops.store_block import record_starts
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    intervals = [(0, 10**9), (12140, 12160), (0, 0), (17384, 17385),
                 (10**8, 2 * 10**8), (12202, 18000)]
    got = [record_starts(store, qc, iv) for iv in intervals]
    # wipe the cache and recompute: must be identical
    store._events_cache = None
    fresh = [record_starts(store, qc, iv) for iv in intervals]
    for iv, a, b in zip(intervals, got, fresh):
        np.testing.assert_array_equal(a, b, err_msg=str(iv))
