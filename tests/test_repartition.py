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
