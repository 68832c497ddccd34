"""Foreign-consumer proof of the BCF2 query-stream byte contract.

The reference's main customer decodes the JNI stream with htsjdk's
BCF2Codec (GenomicsDBQueryStream.java:38).  No external decoder
(pysam/bcftools/JVM) exists in this environment, so the strongest
available check is a CLEANROOM decoder written from the BCF2.2 spec
tables alone (tools/cleanroom_bcf_decoder.py — zero imports from this
package, no shared code with vcf/bcf.py): its record-by-record decode
of the socket stream must equal the golden VCF text."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from golden_utils import REF_TESTS, VCF_ATTRIBUTES_ORDER

from genomicsdb_tpu.query.stream_server import (QueryStreamServer,
                                                read_query_stream)
from genomicsdb_tpu.tools import cleanroom_bcf_decoder as cr


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


def test_cleanroom_module_is_independent():
    """The decoder must import nothing from genomicsdb_tpu (cleanroom
    requirement: no shared code with the encoder)."""
    import ast
    src_path = cr.__file__
    tree = ast.parse(open(src_path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            assert not mod.startswith("genomicsdb"), mod
            assert node.level == 0, "relative import found"
        elif isinstance(node, ast.Import):
            for alias in node.names:
                assert not alias.name.startswith("genomicsdb"), alias.name


import pytest


@pytest.mark.parametrize("doc_extra,golden_name", [
    ({}, "t0_1_2_vcf_at_0"),
    # phased GT + spanning deletions + min-PL GT derivation
    ({"vid_mapping_file": f"{REF_TESTS}/inputs/vid_phased_GT.json",
      "callset_mapping_file":
          f"{REF_TESTS}/inputs/callsets/min_PL_spanning_deletion.json",
      "produce_GT_field": True,
      "produce_GT_with_min_PL_value_for_spanning_deletions": True},
     "min_PL_spanning_deletion_vcf"),
])
def test_cleanroom_decode_matches_golden(doc_extra, golden_name):
    doc = _query_doc()
    doc.update(doc_extra)
    srv = QueryStreamServer(port=0)
    srv.start_background()
    try:
        host, port = srv.address
        data = read_query_stream(host, port, doc)
    finally:
        srv.shutdown()
    assert data[:5] == b"BCF\x02\x02"
    got = cr.decode(data)
    got_recs = [ln for ln in got if not ln.startswith("#")]
    with open(os.path.join(REF_TESTS,
                           f"golden_outputs/{golden_name}")) as f:
        golden = [ln.rstrip("\n") for ln in f]
    golden_recs = [ln for ln in golden if not ln.startswith("#")]
    assert len(got_recs) == len(golden_recs)
    for i, (g, w) in enumerate(zip(got_recs, golden_recs)):
        assert g == w, f"record {i}:\n  cleanroom: {g}\n  golden   : {w}"
