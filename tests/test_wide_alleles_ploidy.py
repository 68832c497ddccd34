"""Batched engine coverage up to the reference caps: merged alleles to
the 50-alt genotyping cap (gt_common.h:48) and ploidy beyond 4.

Round 2 spliced every record merging >16 alleles or carrying ploidy>4
calls to the ~3k pos/s sequential engine; these tests pin the round-3
behavior: such records run batched (zero splice) and byte-match the
sequential oracle, while records beyond the reference's own cap splice
and inherit its skip-genotype-fields-with-warning semantics
(broad_combined_gvcf.cc too_many_alt_alleles)."""

import os

import numpy as np
import pytest

from golden_utils import REF_TESTS

from genomicsdb_tpu.core.config import QueryParams
from genomicsdb_tpu.core.vid import VidMapper
from genomicsdb_tpu.ops import merge as M
from genomicsdb_tpu.ops.store_block import store_to_block
from genomicsdb_tpu.query import driver
from genomicsdb_tpu.store.import_pipeline import import_callsets

HEADER = "\n".join([
    "##fileformat=VCFv4.1",
    '##ALT=<ID=NON_REF,Description="n">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
    '##FORMAT=<ID=AD,Number=.,Type=Integer,Description="a">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="d">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="q">',
    '##FORMAT=<ID=PL,Number=G,Type=Integer,Description="p">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="e">',
    '##contig=<ID=1,length=249250621>',
])

# pool of distinct insertion ALTs (never deletions: REF stays 1 base)
_BASES = "ACGT"
ALT_POOL = ["C" + a + b for a in _BASES for b in _BASES] + \
           ["C" + a + b + c for a in _BASES for b in _BASES
            for c in _BASES]


def _g(n_alleles, ploidy=2):
    import math
    return math.comb(n_alleles + ploidy - 1, ploidy)


def _make_wide_cohort(tmp_path, n_samples, alts_per_sample, rng):
    """Each sample contributes `alts_per_sample` UNIQUE insertion ALTs
    at the shared position 1000 -> the merge yields
    1 + n_samples*alts_per_sample + NON_REF alleles."""
    paths = []
    for s in range(n_samples):
        alts = ALT_POOL[s * alts_per_sample:(s + 1) * alts_per_sample]
        assert len(alts) == alts_per_sample, "ALT_POOL exhausted"
        n_all = len(alts) + 2          # REF + alts + NON_REF
        path = str(tmp_path / f"w{s}.vcf")
        paths.append(path)
        with open(path, "w") as f:
            f.write(HEADER + "\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\t"
                    f"FORMAT\tW{s}\n")
            f.write(f"1\t500\t.\tC\t<NON_REF>\t.\t.\tEND=900\t"
                    f"GT:DP:GQ:PL\t0/0:{rng.randint(1, 60)}:0:0,0,0\n")
            pl = ",".join(str(rng.randint(0, 600))
                          for _ in range(_g(n_all)))
            ad = ",".join(str(rng.randint(0, 50))
                          for _ in range(n_all))
            f.write(f"1\t1000\t.\tC\t{','.join(alts)},<NON_REF>\t.\t.\t"
                    f".\tGT:AD:DP:GQ:PL\t"
                    f"0/{rng.randint(1, len(alts))}:{ad}:"
                    f"{rng.randint(1, 90)}:{rng.randint(0, 99)}:{pl}\n")
            f.write(f"1\t1001\t.\tC\t<NON_REF>\t.\t.\tEND=1400\t"
                    f"GT:DP:GQ:PL\t0/0:{rng.randint(1, 60)}:0:0,0,0\n")
    vid = VidMapper.from_files(os.path.join(REF_TESTS,
                                            "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        f"W{s}": {"row_idx": s, "idx_in_file": 0, "filename": paths[s]}
        for s in range(n_samples)}})
    return import_callsets(vid), vid


@pytest.mark.parametrize("n_samples,alts_per_sample", [
    (4, 4),    # 18 merged alleles — past the old 16 cap
    (6, 5),    # 32 merged
    (7, 7),    # 51 merged = the full 50-alt reference cap
])
def test_wide_allele_merge_batched(tmp_path, n_samples,
                                   alts_per_sample):
    import random
    rng = random.Random(n_samples * 100 + alts_per_sample)
    store, vid = _make_wide_cohort(tmp_path, n_samples,
                                   alts_per_sample, rng)
    n_merged = 1 + n_samples * alts_per_sample + 1
    assert n_merged <= 51
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    # zero splice: the block realizes every record
    blk, meta = store_to_block(store, qc, interval=(0, 2000),
                               return_meta=True)
    assert not meta.needs_fallback.any(), "wide-allele record spliced"
    assert blk.inv_bs.shape[2] >= n_merged
    assert int(blk.rec_num_merged.max()) == n_merged
    seq = driver.run_vcf_query(store, qc, qp, vid)
    qc2 = driver.make_query_config(qp, vid)
    blk_out = driver.run_vcf_query_block(store, qc2, qp, vid)
    assert blk_out.splitlines() == seq.splitlines()


def test_beyond_reference_cap_splices_with_skip_semantics(tmp_path):
    """>50 merged ALT alleles: the record splices to the sequential
    engine, which skips genotype-length fields (the reference's
    too_many_alt_alleles warning path) — outputs still byte-match."""
    import random
    rng = random.Random(9)
    # 8 samples x 7 alts = 56 alts -> 58 merged > 51
    store, vid = _make_wide_cohort(tmp_path, 8, 7, rng)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    blk, meta = store_to_block(store, qc, interval=(0, 2000),
                               return_meta=True)
    assert meta.needs_fallback.any(), "beyond-cap record must splice"
    seq = driver.run_vcf_query(store, qc, qp, vid)
    # the PL column must be dropped at the wide site (skip semantics)
    wide_line = [ln for ln in seq.splitlines()
                 if ln.startswith("1\t1000\t")][0]
    assert ":PL" not in wide_line.split("\t")[8], wide_line
    qc2 = driver.make_query_config(qp, vid)
    blk_out = driver.run_vcf_query_block(store, qc2, qp, vid)
    assert blk_out.splitlines() == seq.splitlines()


def _make_hexaploid_cohort(tmp_path, n_samples, rng):
    """Hexaploid calls (ploidy 6) mixed with diploid ref blocks."""
    paths = []
    for s in range(n_samples):
        path = str(tmp_path / f"h{s}.vcf")
        paths.append(path)
        with open(path, "w") as f:
            f.write(HEADER + "\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\t"
                    f"FORMAT\tH{s}\n")
            pos = 1
            for i in range(24):
                if i % 3 == 2:
                    # hexaploid SNV: 3 alleles (REF, A, NON_REF),
                    # G = C(8, 6) = 28
                    gt = "/".join(str(rng.randint(0, 1))
                                  for _ in range(6))
                    pl = ",".join(str(rng.randint(0, 500))
                                  for _ in range(_g(3, 6)))
                    f.write(f"1\t{pos}\t.\tC\tA,<NON_REF>\t.\t.\t.\t"
                            f"GT:AD:DP:GQ:PL\t{gt}:"
                            f"{rng.randint(0, 40)},{rng.randint(0, 40)}"
                            f",0:{rng.randint(1, 90)}:"
                            f"{rng.randint(0, 99)}:{pl}\n")
                    pos += 1
                else:
                    end = pos + rng.randint(5, 80)
                    f.write(f"1\t{pos}\t.\tC\t<NON_REF>\t.\t.\t"
                            f"END={end}\tGT:DP:GQ:PL\t0/0:"
                            f"{rng.randint(1, 60)}:0:0,0,0\n")
                    pos = end + 1
    vid = VidMapper.from_files(os.path.join(REF_TESTS,
                                            "inputs/vid.json"))
    vid.parse_callsets({"callsets": {
        f"H{s}": {"row_idx": s, "idx_in_file": 0, "filename": paths[s]}
        for s in range(n_samples)}})
    return import_callsets(vid), vid


@pytest.mark.parametrize("seed", [0, 3, 17])
def test_hexaploid_batched(tmp_path, seed):
    """Ploidy-6 calls run batched (no splice) and byte-match the
    sequential engine — round 2 spliced everything past ploidy 4."""
    import random
    rng = random.Random(seed)
    store, vid = _make_hexaploid_cohort(tmp_path, 4, rng)
    qp = QueryParams()
    qp.scan_full = True
    qp.attributes = []
    qc = driver.make_query_config(qp, vid)
    blk, meta = store_to_block(store, qc, return_meta=True)
    assert not meta.needs_fallback.any(), "hexaploid record spliced"
    assert blk.ploidy == 6
    seq = driver.run_vcf_query(store, qc, qp, vid)
    qc2 = driver.make_query_config(qp, vid)
    blk_out = driver.run_vcf_query_block(store, qc2, qp, vid)
    assert blk_out.splitlines() == seq.splitlines()


@pytest.mark.parametrize("mw,ploidy,nm_lo", [
    (51, 2, 17),    # the 50-alt reference cap, diploid
    (11, 5, 4),     # high ploidy: exercises the nCr-table index terms
    (9, 6, 3),      # ploidy 6 (the fuzz-lane cap)
])
def test_wide_remap_kernel_oracle(mw, ploidy, nm_lo):
    """remap_genotype_fields at the lifted caps == the per-call
    sequential oracle (same construction as test_jax_kernels, scaled to
    the 51-allele / ploidy-6 widths)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from test_jax_kernels import random_lut

    from genomicsdb_tpu.core import formats
    from genomicsdb_tpu.ops.jax_kernels import remap_genotype_fields
    rng = np.random.default_rng(5)
    R, S = 3, 4
    g_in = _g(mw, ploidy)
    vals = rng.integers(0, 1000, size=(R, S, g_in)).astype(np.int32)
    inv = np.full((R, S, mw), M.LUT_MISSING, dtype=np.int32)
    in_len = np.zeros((R, S), dtype=np.int32)
    input_nr = np.full((R, S), -1, dtype=np.int32)
    nm = rng.integers(nm_lo, mw + 1, size=R).astype(np.int32)
    luts = {}
    for r in range(R):
        for s in range(S):
            n_in = int(rng.integers(2, min(int(nm[r]), 8) + 1))
            lut = random_lut(rng, n_in, int(nm[r]))
            non_ref = bool(rng.integers(0, 2)) and nm[r] >= 2
            if non_ref:
                lut[n_in - 1] = nm[r] - 1
            luts[(r, s)] = lut
            invr = M.inverse_lut(lut, int(nm[r]))
            inv[r, s, :nm[r]] = invr
            in_len[r, s] = int(rng.integers(1, g_in + 1))
            if non_ref:
                input_nr[r, s] = invr[nm[r] - 1]
    out = np.asarray(remap_genotype_fields(
        vals, inv, in_len, input_nr, nm, num_merged_alleles=mw,
        ploidy=ploidy))
    for r in range(R):
        for s in range(S):
            expected = M.remap_by_genotype(
                vals[r, s, :in_len[r, s]], luts[(r, s)], int(nm[r]),
                input_nr[r, s] >= 0, ploidy, formats.INT_MISSING)
            np.testing.assert_array_equal(
                out[r, s, :len(expected)], expected,
                err_msg=f"r={r} s={s}")
            assert (out[r, s, len(expected):]
                    == formats.INT_MISSING).all()