"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip hardware is not required for tests — sharding paths are validated
on XLA's host-platform virtual devices, exactly as the reference's (absent)
multi-node story is replaced by mesh-sharded execution here.
"""

import os

# The axon TPU plugin (sitecustomize in /root/.axon_site) registers itself
# when PALLAS_AXON_POOL_IPS is set and then forces jax_platforms to
# "axon,cpu" programmatically — clearing the pool IPs *and* setting
# JAX_PLATFORMS is required to actually get the virtual CPU mesh.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
