"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding / shard_map /
halo-exchange paths are exercised without TPU hardware (the driver
separately dry-runs the multi-chip path). Matmul precision is forced to
'highest' so parity-vs-PyTorch allclose checks are meaningful (the TPU
bf16 MXU default would fail them).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS to a TPU plugin (and a sitecustomize
# may have force-registered it); tests run on the virtual 8-device CPU mesh
# unless STGCN_TEST_TPU=1 explicitly opts kernel tests onto real hardware.
if os.environ.get("STGCN_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "model"))


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference PyTorch implementation as a parity oracle.

    The reference is used strictly as a black-box numerical oracle — we run
    its layers on CPU and compare our JAX layers against their outputs.
    """
    if not reference_available():
        pytest.skip("reference repo not mounted at /root/reference")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from model import layers as ref_layers  # type: ignore
        from model import models as ref_models  # type: ignore
        from script import utility as ref_utility  # type: ignore
    finally:
        sys.path.pop(0)
    return {"layers": ref_layers, "models": ref_models, "utility": ref_utility}
