"""run_spark_hdfs.py-equivalent end-to-end Spark lane.

The reference's Spark test (tests/run_spark_hdfs.py, 403 lines)
spark-submits a job whose executors open HDFS-resident TileDB
partitions through GenomicsDBInputFormat and diffs the gathered output
against goldens.  pyspark cannot be installed in this environment
(no egress; verified round 3 + round 4), so this lane runs the SAME
wiring — get_splits -> RDD over a SparkContext-API runner -> executors
re-opening PERSISTED workspace partitions -> ordered gather -> golden
diff — on parallel.local_spark.LocalSparkContext, whose executors are
spawn-isolated worker processes (closures and configs must survive
pickling to interpreters sharing no state, exactly like Spark
executors).  build_rdd runs unchanged against a real SparkContext.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(__file__))
from golden_utils import REF_TESTS, VCF_ATTRIBUTES_ORDER, diff_strings

from genomicsdb_tpu.core.config import ImportParams, QueryParams
from genomicsdb_tpu.parallel.local_spark import LocalSparkContext
from genomicsdb_tpu.parallel import spark_api


def _setup_partitioned_workspace(tmp_path, scheme=""):
    """Import t0/t1/t2 into a 3-column-partition persisted workspace
    via rank-per-partition vcf2gdb worker processes."""
    ws = scheme + str(tmp_path / "ws")
    loader = {
        "column_partitions": [
            # begins fall ON record-start columns (12278 / 17385
            # 1-based), so no gVCF block spans a boundary and the
            # split-ordered gather is byte-identical to the
            # unpartitioned golden (a boundary inside a reference
            # block would — correctly — emit it re-aligned per side)
            {"begin": 0, "workspace": ws, "array_name": "p0"},
            {"begin": 12277, "workspace": ws, "array_name": "p1"},
            {"begin": 17384, "workspace": ws, "array_name": "p2"},
        ],
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
        "reference_genome": os.path.join(
            REF_TESTS, "inputs/chr1_10MB.fasta.gz"),
        "vcf_header_filename": os.path.join(
            REF_TESTS, "inputs/template_vcf_header.vcf"),
        "treat_deletions_as_intervals": True,
    }
    lp = tmp_path / "loader.json"
    lp.write_text(json.dumps(loader))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for r in range(3):
        subprocess.run(
            [sys.executable, "-m", "genomicsdb_tpu.tools.vcf2gdb",
             str(lp), "--rank", str(r)], check=True,
            capture_output=True, env=env)
    return str(lp)


def test_spark_e2e_combined_vcf_matches_golden(tmp_path):
    """Executors (spawned worker processes) each render their split of
    the combined VCF from the persisted file-workspace partition; the
    split-ordered gather is byte-identical to the reference golden."""
    import functools

    lp = _setup_partitioned_workspace(tmp_path)
    ip = ImportParams.from_file(lp)
    qp = QueryParams()
    qp.column_ranges = [[(0, 1000000000)]]
    qp.attributes = list(VCF_ATTRIBUTES_ORDER)
    qp.vcf_header_filename = ip.vcf_header_filename
    qp.reference_genome = ip.reference_genome

    from genomicsdb_tpu.core.vid import VidMapper
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))

    splits = spark_api.get_splits(ip, qp)
    assert len(splits) == 3

    def task(idx, it):
        for split in it:
            yield from spark_api.render_split_vcf(
                split, qp, vid, ip, with_header=(idx == 0))

    sc = LocalSparkContext(parallelism=3)
    rdd = sc.parallelize(splits, len(splits)) \
            .mapPartitionsWithIndex(task)
    assert rdd.getNumPartitions() == 3
    lines = rdd.collect()
    got = "\n".join(lines) + "\n"
    with open(os.path.join(REF_TESTS,
                           "golden_outputs/t0_1_2_vcf_at_0")) as f:
        want = f.read()
    assert got == want, diff_strings(got, want)


def test_spark_e2e_record_counts_and_api(tmp_path):
    """build_rdd over the persisted workspace: record-level RDD ops
    (filter / glom / take / count) behave like pyspark's."""
    lp = _setup_partitioned_workspace(tmp_path)
    ip = ImportParams.from_file(lp)
    qp = QueryParams()
    qp.column_ranges = [[(0, 1000000000)]]
    qp.attributes = ["REF", "ALT", "GT"]

    from genomicsdb_tpu.core.vid import VidMapper
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    sc = LocalSparkContext(parallelism=3)
    rdd = spark_api.build_rdd(sc, ip, qp, vid)
    rows = rdd.map(lambda t: (t[0], t[1])).collect()
    assert len(rows) > 0
    # positions arrive partition-ordered (ordered gather)
    positions = [p for _, p in rows]
    assert positions == sorted(positions)
    # filter / count
    n_low = spark_api.build_rdd(sc, ip, qp, vid) \
        .filter(lambda t: t[1] <= 12202).count()
    assert 0 < n_low < len(rows)
    # glom: one list per partition, concatenation preserves order
    glommed = spark_api.build_rdd(sc, ip, qp, vid) \
        .map(lambda t: t[1]).glom().collect()
    assert [p for part in glommed for p in part] == positions
    # take / first
    first = spark_api.build_rdd(sc, ip, qp, vid).first()
    assert first[1] == positions[0]
