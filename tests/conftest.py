"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh; real-TPU runs happen
in bench.py under the driver.  Must run before jax is imported anywhere.
"""

import os
import sys

# The container exports JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize registers that backend in every process, overriding the env
# var via jax.config.  Tests must run on local CPU with virtual devices:
# force the config back and drop any cached backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:
    pass
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCENES = "/root/reference/DistributionRayTracer/P3D_Scenes"


@pytest.fixture(scope="session")
def scenes_dir():
    return REFERENCE_SCENES
