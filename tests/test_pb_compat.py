"""Wire-compatible protobuf plane: reference-schema PBs -> engine objects.

Builds binary ExportConfiguration / VidMappingPB / CallsetMappingPB
messages exactly as the reference's Java path would, round-trips them
through serialization, and checks the resulting query matches the
JSON-plane golden output byte-for-byte.
"""

import json
import os

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, REF_TESTS,
                          diff_strings, golden)

from genomicsdb_tpu.core import pb_compat
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store.import_pipeline import import_callsets


def _vid_pb_from_json(mods):
    """vid.json -> VidMappingPB (what GATK4 generates from headers)."""
    with open(os.path.join(REF_TESTS, "inputs/vid.json")) as f:
        doc = json.load(f)
    pb = mods["genomicsdb_vid_mapping"].VidMappingPB()
    for name, spec in doc["fields"].items():
        fi = pb.fields.add(name=name)
        t = spec.get("type", "int")
        fi.type.extend(t if isinstance(t, list) else [t])
        for c in spec.get("vcf_field_class", []):
            fi.vcf_field_class.append(c)
        if "vcf_type" in spec:
            fi.vcf_type = spec["vcf_type"]
        length = spec.get("length")
        if length is not None:
            entries = length if isinstance(length, list) else [length]
            for e in entries:
                comp = fi.length.add()
                if isinstance(e, int):
                    comp.fixed_length = e
                elif isinstance(e, dict):
                    comp.variable_length_descriptor = \
                        e["variable_length_descriptor"]
                else:
                    comp.variable_length_descriptor = str(e)
        for d in spec.get("vcf_delimiter", []):
            fi.vcf_delimiter.append(d)
        if "VCF_field_combine_operation" in spec:
            fi.VCF_field_combine_operation = \
                spec["VCF_field_combine_operation"]
    for cname, cspec in doc["contigs"].items():
        pb.contigs.add(name=cname, length=cspec["length"],
                       tiledb_column_offset=cspec["tiledb_column_offset"])
    return pb


def _callsets_pb_from_json(mods):
    with open(os.path.join(REF_TESTS,
                           "inputs/callsets/t0_1_2.json")) as f:
        doc = json.load(f)
    pb = mods["genomicsdb_callsets_mapping"].CallsetMappingPB()
    for name, spec in doc["callsets"].items():
        pb.callsets.add(sample_name=name, row_idx=spec["row_idx"],
                        idx_in_file=spec["idx_in_file"],
                        stream_name=os.path.join(REF_TESTS,
                                                 spec["filename"]))
    return pb


def test_export_config_wire_roundtrip_query():
    mods = pb_compat.compat_pb2()
    exp = mods["genomicsdb_export_config"].ExportConfiguration()
    exp.workspace = "/ws"
    exp.array_name = "t0_1_2"
    exp.reference_genome = os.path.join(REF_TESTS,
                                        "inputs/chr1_10MB.fasta.gz")
    exp.attributes.extend(QUERY_ATTRIBUTES_DEFAULT)
    rl = exp.query_column_ranges.add()
    coi = rl.column_or_interval_list.add()
    coi.column_interval.column_interval.begin = 0
    coi.column_interval.column_interval.end = 1000000000
    rr = exp.query_row_ranges.add()
    rr.range_list.add(low=0, high=3)
    exp.vid_mapping.CopyFrom(_vid_pb_from_json(mods))
    exp.callset_mapping.CopyFrom(_callsets_pb_from_json(mods))
    # binary wire round trip (what the Java path hands over)
    blob = exp.SerializeToString()
    qp, vid = pb_compat.export_config_to_query(blob)
    assert vid is not None
    assert qp.array_name == "t0_1_2"
    assert qp.column_ranges == [[(0, 1000000000)]]
    store = import_callsets(vid, base_dir=REF_TESTS)
    qc = driver.make_query_config(qp, vid)
    got = driver.run_calls_query(store, qc)
    want = golden("t0_1_2_calls_at_0")
    assert got == want, diff_strings(got, want)


def test_export_config_contig_interval():
    mods = pb_compat.compat_pb2()
    exp = mods["genomicsdb_export_config"].ExportConfiguration()
    exp.workspace = "/ws"
    exp.array_name = "a"
    exp.reference_genome = ""
    rl = exp.query_column_ranges.add()
    coi = rl.column_or_interval_list.add()
    ci = coi.column_interval.contig_interval
    ci.contig = "1"
    ci.begin = 12151
    ci.end = 1000000000
    exp.vid_mapping.CopyFrom(_vid_pb_from_json(mods))
    exp.callset_mapping.CopyFrom(_callsets_pb_from_json(mods))
    qp, vid = pb_compat.export_config_to_query(exp.SerializeToString())
    # contig "1" offset 0: 1-based 12151 -> column 12150
    assert qp.column_ranges[0][0][0] == 12150


def test_import_config_wire():
    mods = pb_compat.compat_pb2()
    imp = mods["genomicsdb_import_config"].ImportConfiguration()
    imp.size_per_column_partition = 16384
    imp.treat_deletions_as_intervals = True
    imp.fail_if_updating = True
    part = imp.column_partitions.add()
    part.begin.tiledb_column = 0
    part.workspace = "/ws"
    part.array_name = "arr"
    part2 = imp.column_partitions.add()
    part2.begin.contig_position.contig = "1"
    part2.begin.contig_position.position = 12203
    part2.workspace = "/ws"
    part2.array_name = "arr2"
    imp.vid_mapping.CopyFrom(_vid_pb_from_json(mods))
    imp.callset_mapping.CopyFrom(_callsets_pb_from_json(mods))
    ip, vid = pb_compat.import_config_to_import(imp.SerializeToString())
    assert vid is not None
    assert ip.fail_if_updating
    assert ip.column_partitions[0]["begin"] == 0
    assert ip.column_partitions[1]["begin"] == 12202  # 1-based -> column
    assert ip.partition_bounds(0) == (0, 12201)


def test_gdb_query_query_pb_cli(tmp_path, capsys):
    """gdb_query --query-pb runs a binary ExportConfiguration end to end."""
    from genomicsdb_tpu.tools import gdb_query
    mods = pb_compat.compat_pb2()
    exp = mods["genomicsdb_export_config"].ExportConfiguration()
    exp.workspace = ""
    exp.array_name = "t0_1_2"
    exp.reference_genome = os.path.join(REF_TESTS,
                                        "inputs/chr1_10MB.fasta.gz")
    exp.attributes.extend(QUERY_ATTRIBUTES_DEFAULT)
    rl = exp.query_column_ranges.add()
    coi = rl.column_or_interval_list.add()
    coi.column_interval.column_interval.begin = 0
    coi.column_interval.column_interval.end = 1000000000
    rr = exp.query_row_ranges.add()
    rr.range_list.add(low=0, high=3)
    exp.vid_mapping.CopyFrom(_vid_pb_from_json(mods))
    exp.callset_mapping.CopyFrom(_callsets_pb_from_json(mods))
    pbf = tmp_path / "q.pb"
    pbf.write_bytes(exp.SerializeToString())
    gdb_query.main(["--query-pb", str(pbf), "--print-calls"])
    got = capsys.readouterr().out
    want = golden("t0_1_2_calls_at_0")
    assert got == want, diff_strings(got, want)
