"""Native float rendering (gdb_render_group kind 3) == format_float_vcf.

The htslib-kputd float text rules (6 significant digits fixed-point,
trailing-zero trim with one decimal kept, %g fallback outside
[0.0001, 999999], signed zero) are implemented twice — core/formats.py
for the sequential engine and emit_float_vcf in C for the fused group
renderer.  Fuzz them against each other over an adversarial corpus.
"""

import numpy as np
import pytest

from genomicsdb_tpu.core import formats
from genomicsdb_tpu.runtime import native_loader


@pytest.mark.skipif(native_loader.get_lib() is None,
                    reason="native library unavailable")
def test_float_text_matches_python():
    rng = np.random.default_rng(0)
    vals = [0.0, -0.0, 1.0, -1.0, 0.0001, 0.00009999, 999999.0,
            1000000.0, 999999.4, 123456.7, 0.123456, 1e-30, -1e30,
            3.14159265, 0.5]
    vals += list(rng.uniform(-1e7, 1e7, 400))
    vals += list(rng.uniform(-1e-3, 1e-3, 400))
    vals += list((10.0 ** rng.uniform(-38, 38, 200))
                 * rng.choice([-1, 1], 200))
    arr = np.asarray(vals, dtype=np.float32)
    n = len(arr)
    blob, offs = native_loader.render_group_fused(
        [("floats", arr.reshape(1, n, 1), np.ones((1, n), np.int32),
          b",")], np.zeros(1, np.int64), n)
    got = bytes(blob[offs[0]:offs[1]]).decode().split("\t")
    want = [formats.format_float_vcf(x) for x in arr]
    assert got == want
    # missing / vector-end bit patterns render '.'
    sent = np.array([formats.FLOAT_MISSING_BITS,
                     formats.FLOAT_VECTOR_END_BITS],
                    dtype=np.uint32).view(np.float32)
    blob, offs = native_loader.render_group_fused(
        [("floats", sent.reshape(1, 2, 1), np.ones((1, 2), np.int32),
          b",")], np.zeros(1, np.int64), 2)
    assert bytes(blob[offs[0]:offs[1]]) == b".\t."
