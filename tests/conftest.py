"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Sharding/pjit tests run against this fake mesh; numerics tests just use CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS at import time; the config
# update is authoritative. Tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# The reference repo (used only to GENERATE golden values in tests) predates
# numpy 1.24; restore the removed scalar aliases before it is imported.
for _alias, _type in (("float", float), ("bool", bool), ("int", int), ("object", object)):
    if not hasattr(np, _alias):
        setattr(np, _alias, _type)

import pytest  # noqa: E402


REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    """Put the reference repo on sys.path for golden-value generation."""
    import sys

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference repo not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
