"""Spark-style splits API: (partition x query block) decomposition whose
union of split reads equals the whole-array scan."""

import json
import os

from golden_utils import REF_TESTS

from genomicsdb_tpu.core.config import ImportParams, QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.parallel.spark_api import (InputSplit, get_splits,
                                               read_split)
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.query.scan import scan_variants


def _loader(tmp_path):
    doc = {
        "column_partitions": [
            {"begin": 0, "workspace": "/tmp/ws", "array_name": "p0"},
            {"begin": 12202, "workspace": "/tmp/ws", "array_name": "p1"},
        ],
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
    }
    p = tmp_path / "loader.json"
    p.write_text(json.dumps(doc))
    return ImportParams.from_file(str(p), 0)


def test_get_splits_partition_x_block(tmp_path):
    ip = _loader(tmp_path)
    qp = QueryParams()
    qp.column_ranges = [[(0, 1000000)]]
    splits = get_splits(ip, qp)
    assert splits == [
        InputSplit(0, 0, 12201, 0, 12201),
        InputSplit(1, 12202, 2**63 - 2, 12202, 1000000),
    ]
    # block chopping
    fine = get_splits(ip, qp, query_block_size=10000)
    assert len(fine) > len(splits)
    assert all(s.query_end - s.query_begin < 10000 for s in fine)
    # full coverage, no overlap within a partition
    for rank in (0, 1):
        cols = sorted((s.query_begin, s.query_end) for s in fine
                      if s.rank == rank)
        for (a, b), (c, d) in zip(cols, cols[1:]):
            assert c == b + 1


def test_build_rdd_executes_on_local_context(tmp_path):
    """build_rdd EXECUTES end-to-end on a local[2] context with real
    process-isolated executors (parallel.local_spark): the task closure
    and its configs ship by pickle to fresh interpreters, each executor
    re-imports its split's partition from the loader config, and the
    partition-ordered collect equals the spark golden's record order
    (the run_spark_hdfs.py pattern)."""
    from genomicsdb_tpu.parallel.local_spark import LocalSparkContext
    from genomicsdb_tpu.parallel.spark_api import build_rdd
    ip = _loader(tmp_path)
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    qp = QueryParams()
    qp.column_ranges = [[(0, 1000000)]]
    qp.attributes = []
    sc = LocalSparkContext(parallelism=2)
    rdd = build_rdd(sc, ip, qp, vid)
    assert rdd.getNumPartitions() == 2
    records = rdd.collect()
    got = [(c, p) for c, p, _ in records]
    # oracle: the in-process per-rank scan (no executor round trip);
    # the 2-partition union re-emits intervals spanning the partition
    # edge, exactly like per-rank reference queries do
    want_local = []
    for s in get_splits(ip, qp):
        store = driver.build_store_from_loader(ip, vid, s.rank)
        want_local.extend(
            (c, p) for c, p, _ in read_split(s, qp, vid, store=store))
    assert got == want_local and len(got) > 0
    # spark golden oracle: a single-partition context query must yield
    # the spark-ordered golden's record coordinates
    doc = {"column_partitions": [
        {"begin": 0, "workspace": "/tmp/ws", "array_name": "p0"}],
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json")}
    p1 = tmp_path / "loader1.json"
    p1.write_text(json.dumps(doc))
    ip1 = ImportParams.from_file(str(p1), 0)
    got1 = [(c, p) for c, p, _ in
            build_rdd(sc, ip1, qp, vid, query_block_size=15000)
            .collect()]
    with open(os.path.join(REF_TESTS,
                           "golden_outputs/spark_t0_1_2_vcf_at_0")) as f:
        want_golden = [(ln.split("\t")[0], int(ln.split("\t")[1]))
                       for ln in f if not ln.startswith("#")]
    assert got1 == want_golden


def test_read_splits_match_per_rank_scans(tmp_path):
    """Union of split reads == concatenation of per-rank partition scans
    (the reference's concatenated-rank output model, already golden-
    validated in test_golden_multipartition_java)."""
    ip = _loader(tmp_path)
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    qp = QueryParams()
    qp.column_ranges = [[(0, 1000000)]]
    qp.attributes = []
    stores = {r: driver.build_store_from_loader(ip, vid, r)
              for r in (0, 1)}
    records = []
    for s in get_splits(ip, qp):
        records.extend((c, p) for c, p, _ in
                       read_split(s, qp, vid, store=stores[s.rank]))
    want = []
    for r, (lo, hi) in ((0, (0, 12201)), (1, (12202, 1000000))):
        qc = driver.make_query_config(qp, vid)
        for v in scan_variants(stores[r], qc, (lo, hi)):
            loc = vid.get_contig_location(v.start)
            want.append((loc[0], loc[1] + 1))
    assert records == want
    assert len(records) > 0
