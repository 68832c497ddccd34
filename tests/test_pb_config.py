"""Protobuf config plane: PB specs drive the same query results as JSON."""

import os

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, REF_TESTS, diff_strings,
                          golden, load_setup)

from genomicsdb_tpu.core import pb_config
from genomicsdb_tpu.query import driver


def test_pb_roundtrip_vid_and_query():
    pb = pb_config.pb2()
    vid_json, store = load_setup("inputs/callsets/t0_1_2.json")
    # export the JSON-built vid to PB and rebuild
    vid_spec = pb_config.vid_to_pb(vid_json)
    blob = vid_spec.SerializeToString()
    assert len(blob) > 100
    vid_spec2 = pb.VidSpec()
    vid_spec2.ParseFromString(blob)
    cs = pb.CallsetMap()
    for name, c in vid_json.callsets.items():
        cs.callsets.add(sample_name=name, row=c.row_idx,
                        index_in_file=c.idx_in_file, filename=c.filename)
    vid2 = pb_config.vid_from_pb(vid_spec2, cs)
    # field registry equivalence on the queried names
    for name in QUERY_ATTRIBUTES_DEFAULT:
        a = vid_json.get_field_info(name)
        b = vid2.get_field_info(name)
        assert b is not None, name
        assert a.length.dims == b.length.dims, name
        assert a.combine_op == b.combine_op, name
        assert (a.is_info, a.is_format) == (b.is_info, b.is_format), name
    assert vid2.contigs["1"].offset == 0
    assert vid2.contigs["2"].offset == 249250621
    # PB query spec -> same calls output as the JSON plane
    q = pb.QuerySpec(attributes=QUERY_ATTRIBUTES_DEFAULT)
    q.contig_intervals.add(contig="1", begin=1, end=1000000001)
    q.row_ranges.add(low=0, high=3)
    qp = pb_config.query_params_from_pb(q, vid2)
    qc = driver.make_query_config(qp, vid2)
    got = driver.run_calls_query(store, qc)
    want = golden("t0_1_2_calls_at_0")
    assert got == want, diff_strings(got, want)
