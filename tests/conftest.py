"""Test configuration: run JAX on a virtual 8-device CPU mesh.

SURVEY.md §4 "Multi-device without a cluster": tests exercise the sharded
engine on `--xla_force_host_platform_device_count=8` CPU devices. These env
vars must be set before the first `import jax` anywhere in the test process.
Set PPRX_TEST_TPU=1 to run the suite on the real TPU instead (kernel tests).
"""

import os

_ON_TPU = os.environ.get("PPRX_TEST_TPU", "0") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
import jax  # noqa: E402

if not _ON_TPU:
    # The session's axon sitecustomize imports jax and registers the TPU
    # plugin at interpreter startup (before this file runs), setting
    # jax.config.jax_platforms = "axon,cpu" — env vars alone are too late.
    # Force CPU and enable float64 (oracle-parity tests) via config.update.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

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
