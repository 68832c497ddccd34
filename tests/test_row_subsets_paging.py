"""Row-range subsetting, variants paging, max-alleles operator."""

from golden_utils import (QUERY_ATTRIBUTES_DEFAULT, VCF_ATTRIBUTES_ORDER,
                          load_setup, make_query_params)

from genomicsdb_tpu.query import driver, json_output
from genomicsdb_tpu.query.variants_path import (
    gt_get_column_interval, gt_get_column_interval_paged)


def test_query_row_ranges_subset():
    """query_row_ranges restricts rows (row partitioning,
    genomicsdb_config_base.h:163)."""
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(
        QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)],
        query_row_ranges=[{"range_list": [{"low": 0, "high": 1}]}])
    qc = driver.make_query_config(qp, vid)
    assert qc.rows_to_query == [0, 1]
    out = driver.run_calls_query(store, qc)
    assert '"row": 2' not in out
    assert '"row": 0' in out and '"row": 1' in out
    # combined VCF over the subset: only 2 sample columns
    qp2 = make_query_params(
        VCF_ATTRIBUTES_ORDER, [(0, 1000000000)],
        query_row_ranges=[{"range_list": [{"low": 1, "high": 2}]}])
    qc2 = driver.make_query_config(qp2, vid)
    import os
    from golden_utils import REF_TESTS
    vcf = driver.run_vcf_query(
        store, qc2, qp2, vid,
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS, "inputs/chr1_10MB.fasta.gz"))
    chrom = [l for l in vcf.splitlines() if l.startswith("#CHROM")][0]
    assert chrom.split("\t")[9:] == ["HG01958", "HG01530"]
    # record at 12145 now shows only the two samples
    rec = [l for l in vcf.splitlines() if l.startswith("1\t12145")][0]
    assert len(rec.split("\t")) == 11


def test_variants_paging_concatenation():
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    full = gt_get_column_interval(store, qc, (0, 1000000000))
    vid2, store2 = load_setup("inputs/callsets/t0_1_2.json")
    qc2 = driver.make_query_config(qp, vid2)
    pages = list(gt_get_column_interval_paged(store2, qc2,
                                              (0, 1000000000), 1))
    assert len(pages) >= 3
    cat = [v for page in pages for v in page]
    assert json_output.print_variants_json(cat, qc2) == \
        json_output.print_variants_json(full, qc)


def test_max_alleles_operator():
    from genomicsdb_tpu.query.operators import MaxAllelesCountOperator
    from genomicsdb_tpu.query.scan import scan_and_operate
    vid, store = load_setup("inputs/callsets/t6_7_8.json")
    qp = make_query_params(QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    op = MaxAllelesCountOperator(qc, top_n=3)
    scan_and_operate(store, qc, op.operate, (0, 1000000000))
    out = op.render()
    # the t6_7_8 multi-allelic site at column 8029499 has 4 alleles
    assert "8029499,4" in out


def test_cotton_and_positions_json():
    from genomicsdb_tpu.query.variants_path import gt_get_column_interval
    import json as _json
    vid, store = load_setup("inputs/callsets/t0_1_2.json")
    qp = make_query_params(QUERY_ATTRIBUTES_DEFAULT, [(0, 1000000000)])
    qc = driver.make_query_config(qp, vid)
    variants = gt_get_column_interval(store, qc, (0, 1000000000))
    cotton = json_output.print_cotton_json(variants, qc)
    doc = _json.loads(cotton)
    assert doc["indices"][:2] == [0, 1]
    assert doc["POSITION"][:2] == [12141, 12145]
    assert doc["END"][:2] == [12295, 12277]
    assert doc["REF"][0] == "C"
    pos = json_output.print_positions_json(
        [((12140, 12294), variants[:1])], qc)
    pdoc = _json.loads(pos)
    assert "12141_12295" in pdoc


def test_row_subset_sweep_boundaries_and_uniform_triploid():
    """Two row-subset regressions:

    1. the sweep must NOT split aligned sub-intervals at non-queried
       rows' cell starts (the reference's storage iterator is
       restricted to the queried rows, so a single-sample query of a
       spanning ref block emits ONE record even where other samples'
       cells begin);
    2. a subset selecting only the triploid sample makes the cohort
       UNIFORM ploidy-3 (not mixed), which must render the full
       C(nm+2, 3) PL length (a prior revision truncated to nm).
    Both engines must agree byte-exactly on randomized subsets."""
    import os
    import random

    from golden_utils import (REF_TESTS, VCF_ATTRIBUTES_ORDER,
                              load_setup, make_query_params)
    from genomicsdb_tpu.query import driver

    configs = [
        ("inputs/callsets/t0_1_2.json", "inputs/vid.json"),
        ("inputs/callsets/"
         "t0_haploid_triploid_1_2_3_triploid_deletion.json",
         "inputs/vid_DS_ID_phased_GT.json"),
    ]
    kw = dict(
        template_path=os.path.join(REF_TESTS,
                                   "inputs/template_vcf_header.vcf"),
        reference_path=os.path.join(REF_TESTS,
                                    "inputs/chr1_10MB.fasta.gz"))
    rng = random.Random(11)
    for cs, vidf in configs:
        vid, store = load_setup(cs, vid_file=vidf)
        n_rows = len(vid.callsets)
        cases = [[0], [n_rows - 1]]
        for _ in range(6):
            cases.append(sorted(rng.sample(
                range(n_rows), rng.randint(1, n_rows))))
        for rows in cases:
            lo = rng.randint(0, 20000)
            hi = lo + rng.randint(0, 3_000_000)
            qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(lo, hi)])
            qp.row_ranges = [[(r, r) for r in rows]]
            qc = driver.make_query_config(qp, vid)
            a = driver.run_vcf_query_block(store, qc, qp, vid, **kw)
            qc2 = driver.make_query_config(qp, vid)
            b = driver.run_vcf_query(store, qc2, qp, vid, **kw)
            assert a == b, (cs, rows, lo, hi)
    # the specific single-triploid-sample case that caught both bugs
    vid, store = load_setup(
        "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json",
        vid_file="inputs/vid_DS_ID_phased_GT.json")
    qp = make_query_params(VCF_ATTRIBUTES_ORDER, [(2204, 1306897)])
    qp.row_ranges = [[(3, 3)]]
    qc = driver.make_query_config(qp, vid)
    text = driver.run_vcf_query_block(store, qc, qp, vid, **kw)
    rec = [l for l in text.splitlines() if l.startswith("1\t17384\t")][0]
    pl = rec.split("\t")[-1].split(":")[4]
    assert len(pl.split(",")) == 20    # C(4+2, 3): full triploid PL
