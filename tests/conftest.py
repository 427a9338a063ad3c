"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are validated on virtual CPU devices (real TPU has
one chip in CI); tiny shapes keep this fast.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The CI image's sitecustomize imports jax at interpreter startup (to register
# the axon TPU plugin), so env vars alone are too late — force the platform
# through jax.config before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(params=["fs", "s3"])
def tmp_catalog(tmp_path, request):
    """A fresh catalog on BOTH storage backends: local fs and the s3://
    object-store double (reference: opendal DataOperator — every fuse
    read/write must work against object storage)."""
    from databend_tpu.service.session import SessionContext
    if request.param == "s3":
        return SessionContext(data_root=f"s3://testbucket/{tmp_path.name}")
    return SessionContext(data_root=str(tmp_path))
