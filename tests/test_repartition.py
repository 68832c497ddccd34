"""Repartitioning == importing with the new partition bounds."""

import os

import numpy as np

from golden_utils import REF_TESTS

from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.parallel.repartition import repartition
from genomicsdb_tpu.store.import_pipeline import import_callsets


def _vid():
    return VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))


def test_repartition_matches_partitioned_import():
    full = import_callsets(_vid())
    begins = [0, 12202, 17000]
    parts = repartition([full], begins)
    assert len(parts) == 3
    for i, b in enumerate(begins):
        e = begins[i + 1] - 1 if i + 1 < len(begins) else None
        want = import_callsets(_vid(), column_partition=(b, e))
        got = parts[i]
        assert np.array_equal(got.col, want.col), f"part {i} cols"
        assert np.array_equal(got.row, want.row), f"part {i} rows"
        assert np.array_equal(got.end, want.end), f"part {i} ends"
        for name in want.fields:
            assert np.array_equal(got.fields[name].valid,
                                  want.fields[name].valid), \
                f"part {i} {name}"


def test_repartition_from_multiple_shards():
    """Re-sharding two partition stores onto a different split equals a
    fresh partitioned import."""
    s1 = import_callsets(_vid(), column_partition=(0, 14999))
    s2 = import_callsets(_vid(), column_partition=(15000, None))
    parts = repartition([s1, s2], [0, 12202])
    for i, (b, e) in enumerate(((0, 12201), (12202, None))):
        want = import_callsets(_vid(), column_partition=(b, e))
        assert np.array_equal(parts[i].col, want.col), f"part {i}"
        assert np.array_equal(parts[i].row, want.row), f"part {i}"


def test_rebalance_workflow_end_to_end():
    """histogram equi-partition -> repartition -> per-partition combined
    VCF concatenation == whole-store query (the re-balancing workflow)."""
    from genomicsdb_tpu.core.config import QueryParams
    from genomicsdb_tpu.query import driver
    from genomicsdb_tpu.tools.vcf_histogram import UniformHistogram

    vid = _vid()
    full = import_callsets(vid)
    # histogram over the store's cells
    h = UniformHistogram(int(full.col.max()) + 2, bin_size=1000)
    for c in full.col:
        h.add(int(c))
    begins = h.equi_partition(3)
    assert begins[0] == 0 and len(begins) >= 2
    parts = repartition([full], begins)
    pieces = []
    for i, b in enumerate(begins):
        e = begins[i + 1] - 1 if i + 1 < len(begins) else 10**9
        qp = QueryParams()
        qp.column_ranges = [[(b, e)]]
        qp.attributes = []
        qc = driver.make_query_config(qp, vid)
        pieces.append(driver.run_vcf_query(parts[i], qc, qp, vid))
    combined = "".join(pieces)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    whole = driver.run_vcf_query(full, qc, qp, vid)
    # partition boundaries may split records exactly as the reference's
    # concatenated ranks do; record COUNT may differ at boundaries but
    # every whole-store record position must be covered
    whole_pos = {ln.split("\t")[1] for ln in whole.splitlines() if ln}
    comb_pos = {ln.split("\t")[1] for ln in combined.splitlines() if ln}
    assert whole_pos <= comb_pos
    assert len(comb_pos) >= len(whole_pos)
