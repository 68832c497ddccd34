"""Query-stream socket endpoint: an external process's view of the
BCF2 byte contract (the reference's GenomicsDBQueryStream JNI
InputStream, reader/GenomicsDBQueryStream.java:38)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from golden_utils import REF_TESTS, VCF_ATTRIBUTES_ORDER

from genomicsdb_tpu.query.stream_server import (QueryStreamServer,
                                                read_query_stream)
from genomicsdb_tpu.vcf import bcf


def _query_doc():
    return {
        "workspace": "", "array_name": "",
        "vid_mapping_file": f"{REF_TESTS}/inputs/vid.json",
        "callset_mapping_file": f"{REF_TESTS}/inputs/callsets/t0_1_2.json",
        "vcf_header_filename": [
            f"{REF_TESTS}/inputs/template_vcf_header.vcf"],
        "reference_genome": f"{REF_TESTS}/inputs/chr1_10MB.fasta.gz",
        "attributes": list(VCF_ATTRIBUTES_ORDER),
        "query_column_ranges": [
            {"range_list": [{"low": 0, "high": 1000000000}]}],
        "query_row_ranges": [{"range_list": [{"low": 0, "high": 3}]}],
    }


def test_stream_server_bcf_round_trip():
    srv = QueryStreamServer(port=0)
    srv.start_background()
    try:
        host, port = srv.address
        data = read_query_stream(host, port, _query_doc())
        assert data[:5] == b"BCF\x02\x02"
        text = bcf.bcf_to_text(data)
        recs = [ln for ln in text.splitlines()
                if ln and not ln.startswith("#")]
        with open(os.path.join(REF_TESTS,
                               "golden_outputs/t0_1_2_vcf_at_0")) as f:
            golden_recs = [ln.rstrip("\n") for ln in f
                           if not ln.startswith("#")]
        assert len(recs) == len(golden_recs)
        # positions and alleles survive the BCF2 wire round trip
        for got, want in zip(recs, golden_recs):
            gc, wc = got.split("\t"), want.split("\t")
            assert gc[:5] == wc[:5], (got, want)
        # second connection reuses the cached store
        data2 = read_query_stream(host, port, _query_doc())
        assert data2 == data
        # the server defaults to the block engine; the sequential
        # engine must produce byte-identical BCF2 on the wire
        seq_doc = dict(_query_doc(), engine="sequential")
        data_seq = read_query_stream(host, port, seq_doc)
        assert data_seq == data
    finally:
        srv.shutdown()


def test_vid_ids_declared_fast_path_engages():
    """The headerless stream's O(records) declaration-synthesis skip
    must actually fire: _vid_declarations covers every vid name (incl.
    classless fields like LowQual via FILTER ids), so _vid_ids_declared
    is True for the reference vids (ADVICE r3: it was always False)."""
    import glob

    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.query.stream import CombinedRecordStream
    from genomicsdb_tpu.vcf.bcf import _HeaderDict
    checked = 0
    for vid_path in sorted(glob.glob(f"{REF_TESTS}/inputs/vid*.json")):
        vid = VidMapper.from_files(vid_path)
        stream = CombinedRecordStream.__new__(CombinedRecordStream)
        stream.vid = vid
        hd = _HeaderDict(["##fileformat=VCFv4.1"]
                         + stream._vid_declarations())
        assert stream._vid_ids_declared(hd), vid_path
        checked += 1
    assert checked >= 5


def test_stream_server_reports_errors():
    srv = QueryStreamServer(port=0)
    srv.start_background()
    try:
        host, port = srv.address
        try:
            read_query_stream(host, port,
                              {"vid_mapping_file": "/does/not/exist"})
            raise AssertionError("expected GDBERR")
        except RuntimeError as e:
            assert "GDBERR" in str(e)
    finally:
        srv.shutdown()


def test_persistent_connection_many_queries():
    """Persistent mode: ONE connection serves many queries with framed
    responses, each byte-identical to the one-shot EOF contract."""
    from genomicsdb_tpu.query.stream_server import QueryStreamClient
    srv = QueryStreamServer(port=0)
    srv.start_background()
    try:
        host, port = srv.address
        one_shot = read_query_stream(host, port, _query_doc())
        sub = dict(_query_doc())
        sub["query_column_ranges"] = [
            {"range_list": [{"low": 0, "high": 13000}]}]
        one_shot_sub = read_query_stream(host, port, sub)
        assert one_shot_sub != one_shot
        with QueryStreamClient(host, port) as cli:
            assert cli.query(_query_doc()) == one_shot
            assert cli.query(sub) == one_shot_sub
            assert cli.query(_query_doc()) == one_shot
            # errors arrive in-band and the connection survives
            try:
                cli.query({"vid_mapping_file": "/does/not/exist"})
                raise AssertionError("expected GDBERR")
            except RuntimeError as e:
                assert "GDBERR" in str(e)
            assert cli.query(sub) == one_shot_sub
    finally:
        srv.shutdown()


def test_stream_server_concurrent_clients_threaded_pool():
    """Concurrent persistent clients: the server handles connections in
    threads while the native worker pool serializes parallel sections —
    every response must equal its single-connection reference."""
    import threading

    from genomicsdb_tpu.query.stream_server import QueryStreamClient
    srv = QueryStreamServer(port=0)
    srv.start_background()
    try:
        host, port = srv.address
        docs = []
        for lo, hi in [(0, 1000000000), (0, 13000), (12141, 17000),
                       (17000, 1000000000)]:
            d = dict(_query_doc())
            d["query_column_ranges"] = [
                {"range_list": [{"low": lo, "high": hi}]}]
            docs.append(d)
        want = [read_query_stream(host, port, d) for d in docs]
        errors = []

        def client(tid):
            try:
                with QueryStreamClient(host, port) as cli:
                    for k in range(8):
                        i = (tid + k) % len(docs)
                        got = cli.query(docs[i])
                        assert got == want[i], (tid, k, i, len(got))
            except Exception as e:       # surfaced after join
                errors.append((tid, repr(e)))

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
    finally:
        srv.shutdown()
