"""Shared helpers for golden-output tests: replicates tests/run.py's query
JSON construction (reference tests/run.py:33-88) against our engine."""

from __future__ import annotations

import json
import os
from functools import lru_cache

from genomicsdb_tpu.core.config import ImportParams, QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver

REF_TESTS = "/root/reference/tests"

QUERY_ATTRIBUTES_DEFAULT = [
    "REF", "ALT", "BaseQRankSum", "MQ", "RAW_MQ", "MQ0", "ClippingRankSum",
    "MQRankSum", "ReadPosRankSum", "DP", "GT", "GQ", "SB", "AD", "PL",
    "DP_FORMAT", "MIN_DP", "PID", "PGT"]

VCF_ATTRIBUTES_ORDER = [
    "END", "REF", "ALT", "BaseQRankSum", "ClippingRankSum", "MQRankSum",
    "ReadPosRankSum", "MQ", "RAW_MQ", "MQ0", "DP", "GT", "GQ", "SB", "AD",
    "PL", "PGT", "PID", "MIN_DP", "DP_FORMAT", "FILTER"]

ASA_VCF_ATTRIBUTES = VCF_ATTRIBUTES_ORDER + ["AS_RAW_MQ", "AS_RAW_MQRankSum"]


def golden(name: str) -> str:
    with open(os.path.join(REF_TESTS, "golden_outputs", name)) as f:
        return f.read()


@lru_cache(maxsize=32)
def load_setup(callset_file: str, vid_file: str = "inputs/vid.json"):
    """(vid, store) for a loader config."""
    vid = VidMapper.from_files(os.path.join(REF_TESTS, vid_file),
                               os.path.join(REF_TESTS, callset_file))
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    store = import_callsets(vid, base_dir=REF_TESTS)
    return vid, store


def make_query_params(attributes, column_ranges=None, **kw) -> QueryParams:
    doc = {
        "workspace": "", "array_name": "",
        "vcf_header_filename": ["inputs/template_vcf_header.vcf"],
        "reference_genome": "inputs/chr1_10MB.fasta.gz",
        "attributes": list(attributes),
    }
    if column_ranges is not None:
        doc["query_column_ranges"] = [{"range_list": [
            {"low": lo, "high": hi} for lo, hi in column_ranges]}]
    else:
        doc["scan_full"] = True
    doc["query_row_ranges"] = [{"range_list": [{"low": 0, "high": 3}]}]
    doc.update(kw)
    qp = QueryParams.from_dict(doc)
    qp.base_dir = REF_TESTS
    return qp


def run_calls(callset_file, attributes, column_ranges, vid_file="inputs/vid.json",
              **kw) -> str:
    vid, store = load_setup(callset_file, vid_file)
    qp = make_query_params(attributes, column_ranges, **kw)
    qc = driver.make_query_config(qp, vid)
    return driver.run_calls_query(store, qc)


def run_vcf(callset_file, attributes=None, column_ranges=None,
            vid_file="inputs/vid.json", **kw) -> str:
    vid, store = load_setup(callset_file, vid_file)
    qp = make_query_params(attributes or VCF_ATTRIBUTES_ORDER,
                           column_ranges, **kw)
    qc = driver.make_query_config(qp, vid)
    return driver.run_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))


def run_vcf_block(callset_file, attributes=None, column_ranges=None,
                  vid_file="inputs/vid.json", **kw) -> str:
    """run_vcf through the batched block engine (run_vcf_query_block)."""
    vid, store = load_setup(callset_file, vid_file)
    qp = make_query_params(attributes or VCF_ATTRIBUTES_ORDER,
                           column_ranges, **kw)
    qc = driver.make_query_config(qp, vid)
    return driver.run_vcf_query_block(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))


def run_loading(callset_file, vid_file="inputs/vid.json",
                column_partition=(0, None), **kw) -> str:
    """produce_combined_vcf-during-load stdout: whole-array combine with ALL
    schema attributes (reference load_operators.cc:313-459)."""
    import os as _os
    from genomicsdb_tpu.store.import_pipeline import import_callsets
    vid = VidMapper.from_files(_os.path.join(REF_TESTS, vid_file),
                               _os.path.join(REF_TESTS, callset_file))
    store = import_callsets(vid, base_dir=REF_TESTS,
                            column_partition=column_partition)
    # the loader combine is clamped to the partition interval
    # (load_operators.cc:398-408 current_start clamp + finish)
    from genomicsdb_tpu.core.config import INT64_MAX
    lo = column_partition[0]
    hi = column_partition[1] if column_partition[1] is not None \
        else INT64_MAX - 1
    qp = make_query_params([], [(lo, hi)], **kw)
    qc = driver.make_query_config(qp, vid)
    return driver.run_vcf_query(
        store, qc, qp, vid,
        template_path=_os.path.join(REF_TESTS,
                                    "inputs/template_vcf_header.vcf"),
        reference_path=_os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))


def run_variants(callset_file, attributes, column_ranges,
                 vid_file="inputs/vid.json", **kw) -> str:
    vid, store = load_setup(callset_file, vid_file)
    qp = make_query_params(attributes, column_ranges, **kw)
    qc = driver.make_query_config(qp, vid)
    return driver.run_variants_query(store, qc)


def diff_strings(got: str, want: str, n=40):
    import difflib
    return "\n".join(list(difflib.unified_diff(
        want.splitlines(), got.splitlines(), "golden", "got", lineterm=""))[:n])


def run_java_vcf(callset_file, attributes=None, column_ranges=None,
                 vid_file="inputs/vid.json", sort_samples=False,
                 transform_header=True, **kw) -> str:
    vid, store = load_setup(callset_file, vid_file)
    qp = make_query_params(attributes or VCF_ATTRIBUTES_ORDER,
                           column_ranges, **kw)
    qc = driver.make_query_config(qp, vid)
    return driver.run_java_vcf_query(
        store, qc, qp, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"),
        sort_samples=sort_samples, transform_header=transform_header)
