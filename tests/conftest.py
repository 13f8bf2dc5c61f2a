"""Test configuration: run JAX on a virtual 8-device CPU mesh.

SURVEY.md §4 "Multi-device without a cluster": tests exercise the sharded
engine on `--xla_force_host_platform_device_count=8` CPU devices. These env
vars must be set before the first `import jax` anywhere in the test process.
Set PPRX_TEST_TPU=1 to run the suite on the real TPU instead (kernel tests).
"""

import os

if os.environ.get("PPRX_TEST_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_multigraph(rng, n, m):
    """Random directed multigraph COO without self-loops."""
    src = rng.integers(0, n, size=m)
    dst = (src + 1 + rng.integers(0, n - 1, size=m)) % n
    return src.astype(np.int64), dst.astype(np.int64)
