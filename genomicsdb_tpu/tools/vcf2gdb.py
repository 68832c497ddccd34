"""Import CLI: loader-JSON-driven gVCF import (vcf2tiledb equivalent).

Usage: python -m genomicsdb_tpu.tools.vcf2gdb <loader.json> [--rank R]

Mirrors tools/src/vcf2tiledb.cc: one invocation imports one column
partition (rank-selectable, reference vcf2tiledb.cc:80-82); with
produce_combined_vcf the combined gVCF goes to stdout (the loading golden).
"""

from __future__ import annotations

import argparse
import os
import sys

from ..core.config import ImportParams, QueryParams
from ..core.vid import VidMapper
from ..query import driver as qdriver
from ..store import workspace as ws
from ..store.import_pipeline import import_callsets


def run_import(loader_json: str, rank: int = 0, out=sys.stdout) -> None:
    ip = ImportParams.from_file(loader_json, rank)
    vid = VidMapper.from_files(ip.resolve(ip.vid_mapping_file),
                               ip.resolve(ip.callset_mapping_file))
    # incremental-import row bounds (lb/ub_callset_row_idx,
    # genomicsdb_config_base.h:60-61)
    if ip.lb_callset_row_idx > 0 or ip.ub_callset_row_idx < 2**63 - 2:
        vid.callsets = {k: v for k, v in vid.callsets.items()
                        if ip.lb_callset_row_idx <= v.row_idx
                        <= ip.ub_callset_row_idx}
        vid.rows = {r: v for r, v in vid.rows.items()
                    if ip.lb_callset_row_idx <= r
                    <= ip.ub_callset_row_idx}
    begin, end = (ip.partition_bounds(rank) if ip.column_partitions
                  else (0, None))
    store = import_callsets(
        vid, base_dir=ip.base_dir,
        column_partition=(begin, end),
        treat_deletions_as_intervals=ip.treat_deletions_as_intervals)
    if ip.produce_tiledb_array and ip.column_partitions:
        part = ip.column_partitions[rank] if rank < len(
            ip.column_partitions) else {}
        workspace = part.get("workspace", "")
        array_name = part.get("array_name", part.get("array", ""))
        if workspace and array_name:
            if not ws.is_workspace(workspace):
                ws.create_workspace(workspace)
            import os as _os
            exists = _os.path.isdir(_os.path.join(workspace, array_name))
            if exists and ip.fail_if_updating:
                raise RuntimeError(
                    f"Array {workspace}/{array_name} exists and "
                    "fail_if_updating is set (load_operators.cc:151-153)")
            if ip.delete_and_create_tiledb_array:
                ws.delete_array(workspace, array_name)
            ws.write_fragment(workspace, array_name, store)
            if ip.consolidate_after_load:
                ws.consolidate_array(workspace, array_name)
    if ip.produce_combined_vcf:
        from ..core.config import INT64_MAX
        qp = QueryParams()
        qp.base_dir = ip.base_dir
        qp.attributes = []
        # combine clamped to the partition interval
        # (load_operators.cc:398-408)
        hi = end if end is not None else INT64_MAX - 1
        qp.column_ranges = [[(begin, hi)]]
        qc = qdriver.make_query_config(qp, vid)
        text = qdriver.run_vcf_query(
            store, qc, qp, vid,
            template_path=ip.resolve(ip.vcf_header_filename)
            if ip.vcf_header_filename else None,
            reference_path=ip.resolve(ip.reference_genome)
            if ip.reference_genome else None)
        out.write(text)


def main(argv=None):
    p = argparse.ArgumentParser(prog="vcf2gdb")
    p.add_argument("loader_json")
    p.add_argument("--rank", "-r", type=int, default=0,
                   help="column partition index (MPI-rank equivalent)")
    args = p.parse_args(argv)
    run_import(args.loader_json, args.rank)


if __name__ == "__main__":
    main()
