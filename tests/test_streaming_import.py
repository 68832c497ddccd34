"""Buffer-stream (streaming) import equals file import (golden check)."""

import gzip
import os

from golden_utils import (REF_TESTS, VCF_ATTRIBUTES_ORDER, diff_strings,
                          golden, make_query_params)

from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store.streaming_import import StreamingImporter


def test_buffer_stream_import_t0_1_2():
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    imp = StreamingImporter(vid)
    # one stream per input file, keyed like the buffer-mapping json
    for cs in vid.callsets.values():
        if cs.filename not in imp.streams:
            imp.add_buffer_stream(cs.filename)
    # push each file's text in small chunks, pumping import_batch between
    # writes (the GATK4 GenomicsDBImport loop)
    for name in list(imp.streams):
        data = gzip.open(os.path.join(REF_TESTS, name), "rb").read()
        for off in range(0, len(data), 1000):
            imp.write(name, data[off:off + 1000])
            imp.import_batch()
    assert imp.import_batch()
    store = imp.finalize()
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    got = driver.run_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    want = golden("t0_1_2_vcf_at_0")
    assert got == want, diff_strings(got, want)


def test_buffer_stream_import_bcf_streams():
    """BCF2-encoded buffer streams (the GATK4 default wire format:
    BCF header block + records, sniffed by magic) import identically
    to text streams — golden-exact combined VCF."""
    from genomicsdb_tpu.vcf.bcf import text_to_bcf

    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    imp = StreamingImporter(vid)
    for cs in vid.callsets.values():
        if cs.filename not in imp.streams:
            imp.add_buffer_stream(cs.filename)
    # push each file's BCF2 encoding in awkward chunk sizes (headers
    # and records split across writes)
    for name in list(imp.streams):
        text = gzip.open(os.path.join(REF_TESTS, name),
                         "rb").read().decode()
        data = text_to_bcf(text)
        for off in range(0, len(data), 997):
            imp.write(name, data[off:off + 997])
            imp.import_batch()
    assert imp.import_batch()
    store = imp.finalize()
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    got = driver.run_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    want = golden("t0_1_2_vcf_at_0")
    assert got == want, diff_strings(got, want)
