"""Real-TPU CI lane: a small marked subset that runs on the actual chip
(kernel equivalence, the compiled fused Pallas kernel, one block query)
so device correctness is not only checked at bench time.

Run with `pytest -m tpu`.  Each test executes in a SUBPROCESS on the
axon/TPU backend with a hard timeout — the tunnel can wedge, and a
wedged dispatch cannot be interrupted in-process (bench.py's supervisor
model).  Unreachable device => skip; wrong results => fail.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

# remote AOT compiles through the tunnel take minutes and are not
# reliably served by the persistent cache; 420s skipped otherwise-green
# tests on slow-tunnel days
TIMEOUT = 560


def _run_on_tpu(script: str, timeout: int = TIMEOUT) -> str:
    env = dict(os.environ)
    # run on the real device alongside a cpu backend for oracles
    env["JAX_PLATFORMS"] = "axon,cpu"
    env.pop("XLA_FLAGS", None)
    # conftest blanks the axon pool override so CPU-suite subprocesses
    # stay off the chip; THIS lane wants the chip back
    orig = env.pop("_GDB_AXON_POOL_IPS_ORIG", None)
    if orig:
        env["PALLAS_AXON_POOL_IPS"] = orig
    else:
        env.pop("PALLAS_AXON_POOL_IPS", None)
    # remote compiles dominate (~1-2 min each); persist them
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    try:
        r = subprocess.run([sys.executable, "-c", script],
                           capture_output=True, text=True, env=env,
                           timeout=timeout, cwd="/root/repo")
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel unreachable/wedged (timeout)")
    if "TPU_UNAVAILABLE" in r.stdout:
        pytest.skip("no TPU backend in this environment")
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


PREAMBLE = r"""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
import jax
try:
    tpu = [d for d in jax.devices() if d.platform != "cpu"][0]
except Exception:
    print("TPU_UNAVAILABLE"); raise SystemExit(0)
cpu = jax.devices("cpu")[0]
"""


def test_combine_step_chip_equals_cpu():
    out = _run_on_tpu(PREAMBLE + r"""
from genomicsdb_tpu.ops.combine_step import (block_to_args, combine_step,
                                             synthesize_cohort)
blk = synthesize_cohort(num_samples=8, cells_per_sample=48,
                        region_len=4096, seed=5)
args = block_to_args(blk)
with jax.default_device(tpu):
    dev = combine_step(*args, max_merged=4, ploidy=2)
    dev = {k: np.asarray(v) for k, v in dev.items()}
with jax.default_device(cpu):
    ref = combine_step(*args, max_merged=4, ploidy=2)
    ref = {k: np.asarray(v) for k, v in ref.items()}
for k in ("pl", "ad", "gt", "gq", "dp_format", "min_dp", "dp_info_sum",
          "info_imedian"):
    assert np.array_equal(dev[k], ref[k]), k
for k in ("info_median", "info_fsum"):
    a, b = dev[k], ref[k]
    assert np.array_equal(np.isnan(a), np.isnan(b)), k
    assert np.array_equal(np.where(np.isnan(a), 0, a),
                          np.where(np.isnan(b), 0, b)), k
print("CHIP_EQ_OK")
""")
    assert "CHIP_EQ_OK" in out


def test_fused_pallas_compiled_on_chip():
    out = _run_on_tpu(PREAMBLE + r"""
from genomicsdb_tpu.ops.combine_step import (block_to_args, combine_step,
                                             synthesize_cohort)
from genomicsdb_tpu.ops import pallas_combine as PC
# >= 4096 records so the auto candidates select the production rt=64
# sublane packing (smaller blocks gate down to rt=32)
blk = synthesize_cohort(num_samples=8, cells_per_sample=1024,
                        region_len=65536, seed=21)
assert len(blk.starts) >= 4096, len(blk.starts)
with jax.default_device(tpu):
    fused = PC.combine_step_fused(blk, max_merged=4, ploidy=2,
                                  narrow_out=True)
    assert fused is not None, "window premise failed"
    fused = {k: np.asarray(v) for k, v in fused.items()}
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2)
    ref = {k: np.asarray(v) for k, v in ref.items()}
from genomicsdb_tpu.core import formats as F
for k in ("pl", "ad", "gt", "gq", "dp_format", "min_dp", "dp_info_sum"):
    fv = fused[k]
    if fv.dtype == np.int16:      # narrow outputs: widen the sentinels
        wide = fv.astype(np.int32)
        wide[fv == -32768] = F.INT_MISSING
        wide[fv == -32767] = F.INT_VECTOR_END
        fv = wide
    assert np.array_equal(fv, ref[k]), k
print("FUSED_CHIP_OK")
""")
    assert "FUSED_CHIP_OK" in out


def test_block_query_mixed_ploidy_golden_on_chip():
    # general-ploidy cohorts run batched on the chip too (per-call GT
    # lengths select the genotype enumeration)
    out = _run_on_tpu(PREAMBLE + r"""
with jax.default_device(tpu):
    import golden_utils as gu
    got = gu.run_vcf_block(
        "inputs/callsets/t0_haploid_triploid_1_2_3_triploid_deletion.json",
        gu.VCF_ATTRIBUTES_ORDER, [(0, 1000000000)],
        vid_file="inputs/vid_DS_ID_phased_GT.json")
want = gu.golden("t0_haploid_triploid_1_2_3_triploid_deletion_vcf")
assert got == want, "chip mixed-ploidy block query != golden"
print("CHIP_MIXED_OK")
""", timeout=1500)
    assert "CHIP_MIXED_OK" in out


def test_block_query_golden_on_chip():
    # the full query compiles several distinct programs through the
    # remote AOT service (~1 min each, cached afterwards): bigger budget
    out = _run_on_tpu(PREAMBLE + r"""
import os
with jax.default_device(tpu):
    import golden_utils as gu
    got = gu.run_vcf_block("inputs/callsets/t0_1_2.json",
                           gu.VCF_ATTRIBUTES_ORDER, [(0, 1000000000)])
assert got == gu.golden("t0_1_2_vcf_at_0"), "chip block query != golden"
print("CHIP_GOLDEN_OK")
""", timeout=1500)
    assert "CHIP_GOLDEN_OK" in out


def test_fused_hexaploid_compiled_on_chip():
    """Ploidy-6 cohorts run fused on the chip (round-3 cap was 4); the
    VMEM-aware rt selection must pick a config that actually compiles."""
    out = _run_on_tpu(PREAMBLE + r"""
import numpy as np
from genomicsdb_tpu.ops.combine_step import (block_to_args, combine_step,
                                             synthesize_cohort)
from genomicsdb_tpu.ops import pallas_combine as PC
blk = synthesize_cohort(num_samples=4, cells_per_sample=48,
                        region_len=4096, seed=11, ploidy=6)
with jax.default_device(tpu):
    fused = PC.combine_step_fused(blk, max_merged=4, ploidy=6)
    assert fused is not None, "no fused config fit / window failed"
    fused = {k: np.asarray(v) for k, v in fused.items()}
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=6)
    ref = {k: np.asarray(v) for k, v in ref.items()}
for k in ("pl", "ad", "gt", "gq", "dp_format", "min_dp", "dp_info_sum"):
    assert np.array_equal(fused[k], ref[k]), k
print("FUSED_HEX_CHIP_OK")
""", timeout=1500)
    assert "FUSED_HEX_CHIP_OK" in out


def test_fused_mixed_ploidy_compiled_on_chip():
    """The per-call-ploidy fused variant compiles and matches the XLA
    mixed path on the real chip."""
    out = _run_on_tpu(PREAMBLE + r"""
import numpy as np
from genomicsdb_tpu.ops.combine_step import (block_to_args, combine_step,
                                             synthesize_cohort)
from genomicsdb_tpu.ops import pallas_combine as PC
blk = synthesize_cohort(num_samples=8, cells_per_sample=64,
                        region_len=4096, seed=21)
B, S = np.asarray(blk.live).shape
rng = np.random.default_rng(5)
blk.gt_len_bs = rng.integers(1, 3, size=(B, S)).astype(np.int32)
with jax.default_device(tpu):
    fused = PC.combine_step_fused(blk, max_merged=4, ploidy=2, rt=8,
                                  mixed_ploidy=True)
    assert fused is not None, "window premise failed"
    fused = {k: np.asarray(v) for k, v in fused.items()}
    ref = combine_step(*block_to_args(blk), max_merged=4, ploidy=2,
                       mixed_ploidy=True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
for k in ("pl", "ad", "gt", "gq", "dp_format", "min_dp", "dp_info_sum"):
    assert np.array_equal(fused[k], ref[k]), k
print("FUSED_MIXED_CHIP_OK")
""")
    assert "FUSED_MIXED_CHIP_OK" in out
