"""Block-based VCF production == sequential engine on deletion-free data."""

import os
import random

from golden_utils import REF_TESTS

from genomicsdb_tpu.core.config import QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.query.block_writer import render_block_vcf
from genomicsdb_tpu.store.import_pipeline import import_callsets
from genomicsdb_tpu.vcf.fasta import ReferenceGenome


def _make_cohort(tmp_path, n_samples=12, n_records=120,
                 with_deletions=False):
    random.seed(3)
    path = str(tmp_path / "cohort.vcf")
    samples = [f"S{i}" for i in range(n_samples)]
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        for line in [
            '##ALT=<ID=NON_REF,Description="n">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
            '##FORMAT=<ID=AD,Number=.,Type=Integer,Description="a">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
            '##FORMAT=<ID=MIN_DP,Number=1,Type=Integer,Description="m">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
            '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
            '##INFO=<ID=BaseQRankSum,Number=1,Type=Float,Description="b">',
            '##INFO=<ID=MQ0,Number=1,Type=Integer,Description="z">',
            '##contig=<ID=1,length=249250621>',
        ]:
            f.write(line + "\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(samples) + "\n")
        pos = 1
        for i in range(n_records):
            if with_deletions and i % 11 == 10:
                # multi-base REF deletion record -> spanning-deletion path
                cells = "\t".join(
                    f"0/1:{random.randint(1, 40)},{random.randint(1, 40)},"
                    f"0:{random.randint(10, 99)}:{random.randint(10, 99)}"
                    f":.:{random.randint(0, 500)},0,{random.randint(0, 500)},"
                    f"{random.randint(0, 500)},{random.randint(0, 500)},"
                    f"{random.randint(0, 500)}"
                    for _ in range(n_samples))
                f.write(f"1\t{pos}\t.\tCAT\tC,<NON_REF>\t.\t.\t"
                        f"MQ0={random.randint(0, 9)}\t"
                        f"GT:AD:DP:GQ:MIN_DP:PL\t{cells}\n")
                pos += 1
                continue
            if i % 7 == 6:
                cells = "\t".join(
                    f"0/1:{random.randint(1, 40)},{random.randint(1, 40)},"
                    f"0:{random.randint(10, 99)}:{random.randint(10, 99)}"
                    f":.:{random.randint(0, 500)},0,{random.randint(0, 500)},"
                    f"{random.randint(0, 500)},{random.randint(0, 500)},"
                    f"{random.randint(0, 500)}"
                    for _ in range(n_samples))
                f.write(f"1\t{pos}\t.\tC\tA,<NON_REF>\t.\t.\t"
                        f"BaseQRankSum={random.random():.3f};"
                        f"MQ0={random.randint(0, 9)}\t"
                        f"GT:AD:DP:GQ:MIN_DP:PL\t{cells}\n")
                pos += 1
            else:
                end = pos + random.randint(20, 200)
                cells = "\t".join(
                    f"0/0:.:{random.randint(1, 60)}:0:0:0,0,0"
                    for _ in range(n_samples))
                f.write(f"1\t{pos}\t.\tC\t<NON_REF>\t.\t.\tEND={end}\t"
                        f"GT:AD:DP:GQ:MIN_DP:PL\t{cells}\n")
                pos = end + 1
    return path, samples, pos


def test_block_writer_matches_sequential(tmp_path):
    path, samples, region = _make_cohort(tmp_path)
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    refg = ReferenceGenome(os.path.join(REF_TESTS,
                                        "inputs/chr1_10MB.fasta.gz"))
    sequential = driver.run_vcf_query(store, qc, qp, vid,
                                      template_path=None,
                                      reference_path=None)
    seq_lines = [l for l in sequential.splitlines() if l]
    qc2 = driver.make_query_config(qp, vid)
    block_lines = render_block_vcf(store, qc2, vid, (0, region + 10),
                                   ref_genome=refg)
    assert len(block_lines) == len(seq_lines)
    for a, b in zip(seq_lines, block_lines):
        assert a == b, f"\nseq : {a}\nblk : {b}"
    # pure-Python fallback renders identically to the native kernels
    from genomicsdb_tpu.runtime import native_loader
    import unittest.mock as mock
    with mock.patch.object(native_loader, "get_lib", lambda: None):
        py_lines = render_block_vcf(store, qc2, vid, (0, region + 10),
                                    ref_genome=refg)
    assert py_lines == block_lines


def test_block_many_alleles_fallback(tmp_path):
    """A site merging to more alleles than max_merged holds must splice
    the sequential engine (device arrays would truncate)."""
    header = "\n".join([
        "##fileformat=VCFv4.1",
        '##ALT=<ID=NON_REF,Description="n">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
        '##contig=<ID=1,length=249250621>',
    ])
    paths = []
    # each sample contributes a DIFFERENT SNV at the same position ->
    # merged site has 5 alleles (REF + 3 SNVs + NON_REF) > max_merged=4
    for i, alt in enumerate(["A", "T", "G"]):
        p = str(tmp_path / f"m{i}.vcf")
        paths.append(p)
        with open(p, "w") as f:
            f.write(header + "\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                    f"\tINFO\tFORMAT\tM{i}\n")
            f.write(f"1\t500\t.\tC\t{alt},<NON_REF>\t.\t.\t.\t"
                    "GT:DP:GQ:PL\t0/1:30:50:100,0,200,40,60,80\n")
            f.write("1\t501\t.\tC\t<NON_REF>\t.\t.\tEND=600\t"
                    "GT:DP:GQ:PL\t0/0:20:0:0,0,0\n")
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        f"M{i}": {"row_idx": i, "idx_in_file": 0, "filename": paths[i]}
        for i in range(3)}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    seq = driver.run_vcf_query(store, qc, qp, vid,
                               template_path=None, reference_path=None)
    qc2 = driver.make_query_config(qp, vid)
    hyb = driver.run_vcf_query_block(store, qc2, qp, vid,
                                     template_path=None,
                                     reference_path=None)
    assert hyb.splitlines() == seq.splitlines()
    assert any(ln.split("\t")[4].count(",") >= 3
               for ln in seq.splitlines())  # >=4 ALT alleles present


def test_block_multi_contig(tmp_path):
    """Records on two contigs: the block engine switches contig names at
    the vid offset boundary exactly like the sequential engine."""
    path = str(tmp_path / "mc.vcf")
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        for line in [
            '##ALT=<ID=NON_REF,Description="n">',
            '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
            '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
            '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
            '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
            '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
            '##contig=<ID=1,length=249250621>',
            '##contig=<ID=2,length=243199373>',
        ]:
            f.write(line + "\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                "\tSA\tSB\n")
        for contig in ("1", "2"):
            f.write(f"{contig}\t5\t.\tC\t<NON_REF>\t.\t.\tEND=60\t"
                    "GT:DP:GQ:PL\t0/0:11:0:0,0,0\t0/0:12:0:0,0,0\n")
            f.write(f"{contig}\t100\t.\tG\tA,<NON_REF>\t.\t.\t.\t"
                    "GT:DP:GQ:PL\t0/1:30:50:100,0,200,40,60,80\t"
                    "0/0:25:40:0,40,90,50,60,70\n")
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(["SA", "SB"])}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    sequential = driver.run_vcf_query(store, qc, qp, vid,
                                      template_path=None,
                                      reference_path=None)
    qc2 = driver.make_query_config(qp, vid)
    hybrid = driver.run_vcf_query_block(store, qc2, qp, vid,
                                        template_path=None,
                                        reference_path=None)
    assert hybrid.splitlines() == sequential.splitlines()
    contigs = {l.split("\t", 1)[0] for l in hybrid.splitlines()}
    assert contigs == {"1", "2"}


def test_block_driver_hybrid_mnp_overlap(tmp_path):
    """A multi-position variant (MNP) overlapping another sample's SNP
    needs per-record merge: the hybrid engine must splice sequential."""
    header = "\n".join([
        "##fileformat=VCFv4.1",
        '##ALT=<ID=NON_REF,Description="n">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
        '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
        '##contig=<ID=1,length=249250621>',
    ])
    pa = str(tmp_path / "sa.vcf")
    with open(pa, "w") as f:
        f.write(header + "\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\t"
                "INFO\tFORMAT\tSA\n")
        f.write("1\t100\t.\tCA\tTG,<NON_REF>\t.\t.\t.\t"
                "GT:DP:GQ:PL\t0/1:30:50:100,0,200,40,60,80\n")
        f.write("1\t102\t.\tC\t<NON_REF>\t.\t.\tEND=150\t"
                "GT:DP:GQ:PL\t0/0:20:0:0,0,0\n")
    pb = str(tmp_path / "sb.vcf")
    with open(pb, "w") as f:
        f.write(header + "\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\t"
                "INFO\tFORMAT\tSB\n")
        f.write("1\t101\t.\tA\tT,<NON_REF>\t.\t.\t.\t"
                "GT:DP:GQ:PL\t0/1:25:40:90,0,180,30,50,70\n")
        f.write("1\t102\t.\tC\t<NON_REF>\t.\t.\tEND=150\t"
                "GT:DP:GQ:PL\t0/0:22:0:0,0,0\n")
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        "SA": {"row_idx": 0, "idx_in_file": 0, "filename": pa},
        "SB": {"row_idx": 1, "idx_in_file": 0, "filename": pb}}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    sequential = driver.run_vcf_query(store, qc, qp, vid,
                                      template_path=None,
                                      reference_path=None)
    qc2 = driver.make_query_config(qp, vid)
    hybrid = driver.run_vcf_query_block(store, qc2, qp, vid,
                                        template_path=None,
                                        reference_path=None)
    assert hybrid.splitlines() == sequential.splitlines()
    assert len(hybrid.splitlines()) >= 3


def test_block_driver_hybrid_with_deletions(tmp_path):
    """run_vcf_query_block splices the sequential engine for deletion
    spans and is byte-identical to run_vcf_query on a mixed cohort."""
    path, samples, region = _make_cohort(tmp_path, n_samples=6,
                                         n_records=110,
                                         with_deletions=True)
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qp.reference_genome = os.path.join(REF_TESTS,
                                       "inputs/chr1_10MB.fasta.gz")
    qc = driver.make_query_config(qp, vid)
    sequential = driver.run_vcf_query(
        store, qc, qp, vid, template_path=None,
        reference_path=qp.reference_genome)
    qc2 = driver.make_query_config(qp, vid)
    hybrid = driver.run_vcf_query_block(
        store, qc2, qp, vid, template_path=None,
        reference_path=qp.reference_genome)
    assert hybrid.splitlines() == sequential.splitlines()
    # produce_GT mode delegates wholly to the sequential engine
    qp_gt = QueryParams()
    qp_gt.__dict__.update(qp.__dict__)
    qp_gt.produce_GT_field = True
    qc3 = driver.make_query_config(qp_gt, vid)
    seq_gt = driver.run_vcf_query(store, qc3, qp_gt, vid,
                                  template_path=None,
                                  reference_path=qp.reference_genome)
    qc4 = driver.make_query_config(qp_gt, vid)
    hyb_gt = driver.run_vcf_query_block(store, qc4, qp_gt, vid,
                                        template_path=None,
                                        reference_path=qp.reference_genome)
    assert hyb_gt == seq_gt
    assert "0/1" in hyb_gt or "1/0" in hyb_gt


def test_block_engine_multipartition_cli(tmp_path, capsys):
    """--num-ranks 3 --engine block == sequential through the CLI
    (partition-begin spanning replay + ordered gather)."""
    import json

    from genomicsdb_tpu.tools import gdb_query
    loader = {
        "column_partitions": [
            {"begin": 0, "workspace": "/tmp/nows", "array_name": "p0"},
            {"begin": 12202, "workspace": "/tmp/nows",
             "array_name": "p1"},
            {"begin": 17000, "workspace": "/tmp/nows",
             "array_name": "p2"},
        ],
        "callset_mapping_file": os.path.join(
            REF_TESTS, "inputs/callsets/t0_1_2.json"),
        "vid_mapping_file": os.path.join(REF_TESTS, "inputs/vid.json"),
        "reference_genome": os.path.join(REF_TESTS,
                                         "inputs/chr1_10MB.fasta.gz"),
        "vcf_header_filename": os.path.join(
            REF_TESTS, "inputs/template_vcf_header.vcf"),
        "treat_deletions_as_intervals": True,
    }
    lp = tmp_path / "l.json"
    lp.write_text(json.dumps(loader))
    query = {
        "workspace": "", "array_name": "",
        "query_column_ranges": [
            {"range_list": [{"low": 0, "high": 1000000000}]}],
        "vid_mapping_file": loader["vid_mapping_file"],
        "callset_mapping_file": loader["callset_mapping_file"],
        "reference_genome": loader["reference_genome"],
        "vcf_header_filename": [loader["vcf_header_filename"]],
        "attributes": ["REF", "ALT", "BaseQRankSum", "MQ", "RAW_MQ",
                       "MQ0", "ClippingRankSum", "MQRankSum",
                       "ReadPosRankSum", "DP", "GT", "GQ", "SB", "AD",
                       "PL", "PGT", "PID", "MIN_DP", "DP_FORMAT"],
    }
    qp = tmp_path / "q.json"
    qp.write_text(json.dumps(query))

    def run(engine):
        gdb_query.main(["-j", str(qp), "-l", str(lp), "--num-ranks", "3",
                        "--produce-Broad-GVCF", "--engine", engine])
        return capsys.readouterr().out

    seq = run("sequential")
    blk = run("block")
    assert blk == seq
    assert len(seq.splitlines()) > 100


def test_block_engine_record_chunking(tmp_path):
    """Tiny max_records_per_block (forcing many chunks, incl. deletion
    runs crossing chunk edges) == the unchunked output."""
    path, samples, region = _make_cohort(tmp_path, n_samples=8,
                                         n_records=150,
                                         with_deletions=True)
    vid = VidMapper.from_files(
        os.path.join(REF_TESTS, "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        s: {"row_idx": i, "idx_in_file": i, "filename": path}
        for i, s in enumerate(samples)}})
    store = import_callsets(vid)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    whole = driver.run_vcf_query_block(
        store, driver.make_query_config(qp, vid), qp, vid)
    chunked = driver.run_vcf_query_block(
        store, driver.make_query_config(qp, vid), qp, vid,
        max_records_per_block=16)
    assert chunked == whole
    seq = driver.run_vcf_query(store, driver.make_query_config(qp, vid),
                               qp, vid)
    assert chunked.splitlines() == seq.splitlines()
