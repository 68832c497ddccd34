import os
import sys

# Force tests onto a virtual 8-device CPU mesh; the real TPU chip is reserved
# for bench.py.  The container's sitecustomize pre-registers the 'axon' TPU
# platform and sets JAX_PLATFORMS=axon, so override via jax.config (backends
# initialize lazily - this runs before the first computation).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# exported so SUBPROCESSES spawned by tests (CLI workers, local-spark
# executors) also resolve to CPU: with the pool-IPs override empty, the
# sitecustomize axon registration stands down in children too.  The
# container's original value is stashed so the real-TPU lane
# (test_tpu_lane) can restore it for ITS subprocesses.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ["_GDB_AXON_POOL_IPS_ORIG"] = \
        os.environ["PALLAS_AXON_POOL_IPS"]
os.environ["PALLAS_AXON_POOL_IPS"] = ""
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_TESTS = "/root/reference/tests"

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU chip (select with -m tpu)")
    config.addinivalue_line(
        "markers", "slow: multi-minute lanes (select with -m slow)")


def pytest_collection_modifyitems(config, items):
    # the real-TPU lane only runs when explicitly selected: the chip sits
    # behind a wedgeable tunnel and must not slow/flake the default suite
    markexpr = config.getoption("-m", default="") or ""
    skip_tpu = pytest.mark.skip(
        reason="real-TPU lane (run: pytest -m tpu tests/test_tpu_lane.py)")
    skip_slow = pytest.mark.skip(
        reason="multi-minute lane (run: pytest -m slow)")
    for item in items:
        if "tpu" in item.keywords and "tpu" not in markexpr:
            item.add_marker(skip_tpu)
        if "slow" in item.keywords and "slow" not in markexpr:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def ref_tests_dir():
    return REFERENCE_TESTS
