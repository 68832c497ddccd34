import os

# Force CPU with a virtual 8-device mesh for sharding tests; the real TPU is
# reserved for bench.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") +
     " --xla_force_host_platform_device_count=8").strip())

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_TESTS = "/root/reference/tests"

import pytest


@pytest.fixture(scope="session")
def ref_tests_dir():
    return REFERENCE_TESTS
