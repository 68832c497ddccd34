"""BCF2.2 encoding: text -> BCF -> text round trip on real query output."""

import gzip
import os
import struct

from golden_utils import (REF_TESTS, VCF_ATTRIBUTES_ORDER, golden,
                          run_vcf, diff_strings)

from genomicsdb_tpu.vcf.bcf import bcf_to_text, text_to_bcf
from genomicsdb_tpu.vcf import bgzf


def test_bcf_roundtrip_t0_1_2_golden():
    """The full golden combined VCF survives text->BCF->text."""
    text = run_vcf("inputs/callsets/t0_1_2.json", VCF_ATTRIBUTES_ORDER,
                   [(0, 1000000000)])
    blob = text_to_bcf(text)
    assert blob[:5] == b"BCF\x02\x02"
    back = bcf_to_text(blob)
    assert back == text, diff_strings(back, text)


def test_bcf_roundtrip_haploid_triploid():
    """General-ploidy GT and spanning-deletion records round trip."""
    text = run_vcf(
        "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json",
        VCF_ATTRIBUTES_ORDER, [(0, 1000000000)],
        vid_file="inputs/vid_DS_ID_phased_GT.json")
    back = bcf_to_text(text_to_bcf(text))
    assert back == text, diff_strings(back, text)


def test_bcf_file_writer(tmp_path):
    """vcf_output_format 'b' writes a BGZF-framed BCF file."""
    text = run_vcf("inputs/callsets/t0_1_2.json", VCF_ATTRIBUTES_ORDER,
                   [(12150, 1000000000)])
    path = str(tmp_path / "out.bcf")
    with bgzf.open_output(path, "b") as f:
        f.write(text)
    raw = open(path, "rb").read()
    assert raw[:2] == b"\x1f\x8b"          # BGZF = gzip framing
    body = gzip.decompress(raw)
    assert body[:5] == b"BCF\x02\x02"
    assert bcf_to_text(body) == text
    # header length field sane
    (l_header,) = struct.unpack_from("<I", body, 5)
    assert 0 < l_header < len(body)


def test_bcf_query_stream():
    """CombinedRecordStream.bcf_stream serves a decodable BCF2 byte
    stream identical in content to the text stream (the Java
    GenomicsDBQueryStream wire format)."""
    from genomicsdb_tpu.core.vid import VidMapper
    from genomicsdb_tpu.query import driver
    from genomicsdb_tpu.query.stream import CombinedRecordStream
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    from golden_utils import make_query_params

    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"),
        os.path.join(REF_TESTS, "inputs/callsets/t0_1_2.json"))
    store = import_callsets(vid)
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    tmpl = os.path.join(REF_TESTS, "inputs/template_vcf_header.vcf")
    stream = CombinedRecordStream(store, qc, qp, vid, tmpl,
                                  os.path.join(REF_TESTS,
                                               "inputs/chr1_10MB.fasta.gz"))
    blob = b"".join(stream.bcf_stream())
    text = bcf_to_text(blob)
    qc2 = driver.make_query_config(qp, vid)
    want = driver.run_vcf_query(
        store, qc2, qp, vid, template_path=tmpl,
        reference_path=os.path.join(REF_TESTS,
                                    "inputs/chr1_10MB.fasta.gz"))
    assert text == want, diff_strings(text, want)


def test_native_encoder_matches_python():
    """The native BCF2 record encoder (gdb_bcf_encode_records) is
    byte-identical to the Python _encode_record on real query output,
    including haploid/triploid GT, deletions, and float fields."""
    import os

    import pytest
    if os.environ.get("GENOMICSDB_TPU_NO_NATIVE", "") not in ("", "0"):
        pytest.skip("native kernels disabled (GENOMICSDB_TPU_NO_NATIVE)")
    from genomicsdb_tpu.vcf.bcf import (_HeaderDict, _encode_record,
                                        _encode_records_native,
                                        _synthesize_declarations)

    for callset, vidf in [
            ("inputs/callsets/t0_1_2.json", "inputs/vid.json"),
            ("inputs/callsets/"
             "t0_haploid_triploid_1_2_3_triploid_deletion.json",
             "inputs/vid_DS_ID_phased_GT.json")]:
        text = run_vcf(callset, VCF_ATTRIBUTES_ORDER, [(0, 1000000000)],
                       vid_file=vidf)
        lines = [ln for ln in text.splitlines() if ln]
        hdr = [ln for ln in lines if ln.startswith("#")]
        recs = [ln for ln in lines if not ln.startswith("#")]
        hd = _HeaderDict(hdr)
        extra = _synthesize_declarations(recs, hd)
        if extra:
            hdr = hdr[:-1] + extra + [hdr[-1]]
            hd = _HeaderDict(hdr)
        n_sample = len(hdr[-1].split("\t")) - 9
        native = _encode_records_native(recs, hd, n_sample)
        assert native is not None, "native encoder unavailable"
        python = [_encode_record(r, hd, n_sample) for r in recs]
        assert len(native) == len(python)
        for i, (a, b) in enumerate(zip(native, python)):
            assert a == b, f"record {i} differs: {recs[i][:120]}"


def test_native_decoder_matches_python():
    """The native BCF2 record decoder (gdb_bcf_decode_records) is
    byte-identical to the Python cleanroom decoder on the whole golden
    VCF corpus (encode with text_to_bcf, decode both ways)."""
    import glob
    import gzip
    import os

    import pytest
    if os.environ.get("GENOMICSDB_TPU_NO_NATIVE", "") not in ("", "0"):
        pytest.skip("native kernels disabled (GENOMICSDB_TPU_NO_NATIVE)")
    from genomicsdb_tpu.runtime import native_loader as nl
    if nl.get_lib() is None:
        pytest.skip("no native toolchain")
    from genomicsdb_tpu.vcf.bcf import bcf_to_text, text_to_bcf

    checked = 0
    for p in sorted(glob.glob(os.path.join(
            REF_TESTS, "inputs/vcfs/*.vcf.gz"))):
        try:
            text = gzip.decompress(open(p, "rb").read()).decode()
            data = text_to_bcf(text)
        except Exception:
            continue   # corpus files the encoder does not cover
        native = bcf_to_text(data)
        os.environ["GENOMICSDB_TPU_NO_NATIVE"] = "1"
        try:
            python = bcf_to_text(data)
        finally:
            del os.environ["GENOMICSDB_TPU_NO_NATIVE"]
        assert native == python, os.path.basename(p)
        checked += 1
    assert checked >= 10   # the corpus must actually be exercised
