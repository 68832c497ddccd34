"""Config generation from headers + one-shot combiner."""

import io
import os

from golden_utils import REF_TESTS

from genomicsdb_tpu.tools.generate_config import (generate_callsets,
                                                  generate_vid)
from genomicsdb_tpu.tools.vcf_combiner import combine
from genomicsdb_tpu.vcf.reader import VCFFile


def _paths():
    return [os.path.join(REF_TESTS, f"inputs/vcfs/t{i}.vcf.gz")
            for i in (0, 1, 2)]


def test_generate_vid_and_callsets():
    headers = []
    for p in _paths():
        v = VCFFile(p)
        headers.append(v.header)
        v.close()
    vid = generate_vid(headers)
    assert vid["fields"]["GT"]["length"] == "PP"
    assert vid["fields"]["PL"]["length"] == "G"
    assert vid["fields"]["AD"]["length"] == "R" or \
        vid["fields"]["AD"]["length"] == "VAR"
    assert vid["fields"]["DP"]["vcf_field_class"] == ["INFO", "FORMAT"]
    assert vid["contigs"]["1"]["tiledb_column_offset"] == 0
    assert vid["contigs"]["2"]["tiledb_column_offset"] == 249250621
    cs = generate_callsets(_paths())["callsets"]
    assert cs["HG00141"]["row_idx"] == 0
    assert cs["HG01958"]["row_idx"] == 1
    assert cs["HG01530"]["row_idx"] == 2


def test_one_shot_combiner():
    buf = io.StringIO()
    combine(_paths(),
            reference=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"),
            out=buf,
            template_path=os.path.join(
                REF_TESTS, "inputs/template_vcf_header.vcf"))
    out = buf.getvalue()
    recs = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert len(recs) == 4
    # the multi-allelic merged site
    site = [r for r in recs if r.startswith("1\t17385")][0]
    cols = site.split("\t")
    assert cols[4] == "A,T,<NON_REF>"
    assert "DP=276" in cols[7]
