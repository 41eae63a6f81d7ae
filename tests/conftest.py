"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
`--xla_force_host_platform_device_count=8` (the driver separately
dry-runs the sharded step through __graft_entry__.dryrun_multichip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Force CPU: this image pre-imports jax and registers a tunneled TPU
# backend via sitecustomize (JAX_PLATFORMS=axon), so the env var alone
# is too late — use the config API. Tests must be hermetic and fast;
# set POSECNN_TEST_TPU=1 to opt in to running the suite on hardware.
if os.environ.get("POSECNN_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(3)
