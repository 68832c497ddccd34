"""URI-scheme (object-store) workspace backend: the reference's HDFS
workspace support (CMakeLists.txt:45,264-266, tests/run_spark_hdfs.py)
mapped onto fsspec.  memory:// exercises the full non-POSIX path in
CI; hdfs://, s3://, gs:// route identically through the same code."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from golden_utils import (REF_TESTS, VCF_ATTRIBUTES_ORDER, golden,
                          load_setup, make_query_params)

from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store import workspace as ws


@pytest.fixture
def mem_ws():
    path = "memory://gdb_test_ws"
    ws.create_workspace(path, overwrite=True)
    yield path
    import fsspec
    fs = fsspec.filesystem("memory")
    try:
        fs.rm("/gdb_test_ws", recursive=True)
    except FileNotFoundError:
        pass


@pytest.fixture
def http_ws(tmp_path):
    """A workspace built locally and served over a REAL network
    filesystem: localhost HTTP (fsspec HTTPFileSystem — read-only,
    range reads, HTML-scraped listings).  The closest offline-capable
    analog of the reference's HDFS workspaces
    (CMakeLists.txt:45,264-266)."""
    import functools
    import http.server
    import threading
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(tmp_path))
    handler.log_message = lambda *a, **k: None
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield str(tmp_path), \
            f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.parametrize("fmt", ["v2", "npz"])
def test_http_workspace_query(http_ws, fmt):
    """Import locally, serve the workspace over HTTP, query the remote
    URI — golden-byte equal (both fragment formats: npz streams through
    fsspec, v2 downloads to a local spill then memory-maps)."""
    local_dir, base_url = http_ws
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    wsp = os.path.join(local_dir, "ws_" + fmt)
    ws.create_workspace(wsp)
    ws.write_fragment(wsp, "arr", store, fmt=fmt)
    url = f"{base_url}/ws_{fmt}"
    assert ws.is_workspace(url)
    got = ws.open_array(url, "arr")
    assert got.num_cells == store.num_cells
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    out = driver.run_vcf_query(
        got, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS,
                                    "inputs/chr1_10MB.fasta.gz"))
    assert out == golden("t0_1_2_vcf_at_0")


def test_http_workspace_simplecache_chain(http_ws):
    """The simplecache:: protocol chain (fsspec's local block cache in
    front of the remote) serves the same bytes."""
    local_dir, base_url = http_ws
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    wsp = os.path.join(local_dir, "ws_cache")
    ws.create_workspace(wsp)
    ws.write_fragment(wsp, "arr", store, fmt="npz")
    url = f"simplecache::{base_url}/ws_cache"
    got = ws.open_array(url, "arr")
    assert got.num_cells == store.num_cells
    np.testing.assert_array_equal(got.col, store.col)


def test_uri_workspace_round_trip(mem_ws):
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    assert ws.is_workspace(mem_ws)
    ws.write_fragment(mem_ws, "arr", store)
    got = ws.open_array(mem_ws, "arr")
    assert got.num_cells == store.num_cells
    np.testing.assert_array_equal(got.col, store.col)
    # queries over the re-opened store reproduce the golden
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    out = driver.run_vcf_query(
        got, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS,
                                    "inputs/chr1_10MB.fasta.gz"))
    assert out == golden("t0_1_2_vcf_at_0")


def test_uri_workspace_fragments_consolidate(mem_ws):
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    half = store.num_cells // 2
    import copy

    def slice_store(lo, hi):
        sub = copy.deepcopy(store)
        sel = slice(lo, hi)
        sub.row, sub.col = store.row[sel], store.col[sel]
        sub.end, sub.eff_end = store.end[sel], store.eff_end[sel]
        for name, fd in store.fields.items():
            sfd = sub.fields[name]
            sfd.valid = fd.valid[sel]
            if fd.kind == "fixed":
                sfd.values = fd.values[sel]
            elif fd.offsets is not None and fd.kind != "ragged2d":
                sfd.values = fd.values[fd.offsets[lo]:fd.offsets[hi]]
                sfd.offsets = fd.offsets[lo:hi + 1] - fd.offsets[lo]
        return sub

    ws.write_fragment(mem_ws, "arr", slice_store(0, half))
    ws.write_fragment(mem_ws, "arr", slice_store(half, store.num_cells))
    assert len(ws._fragment_paths(mem_ws, "arr")) == 2
    merged = ws.open_array(mem_ws, "arr")
    assert merged.num_cells == store.num_cells
    ws.consolidate_array(mem_ws, "arr")
    assert len(ws._fragment_paths(mem_ws, "arr")) == 1
    again = ws.open_array(mem_ws, "arr")
    assert again.num_cells == store.num_cells


def test_file_scheme_workspace_round_trip(tmp_path):
    """file:// — a second fsspec scheme (local FS through the fsspec
    stack, NOT the POSIX fast path): full write/open/query round trip
    against the golden."""
    path = "file://" + str(tmp_path / "gdb_file_ws")
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    ws.create_workspace(path, overwrite=True)
    assert ws.is_workspace(path)
    ws.write_fragment(path, "arr", store)
    got = ws.open_array(path, "arr")
    assert got.num_cells == store.num_cells
    np.testing.assert_array_equal(got.col, store.col)
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    out = driver.run_vcf_query_block(
        got, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS,
                                    "inputs/chr1_10MB.fasta.gz"))
    assert out == golden("t0_1_2_vcf_at_0")
