"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective
tests run against ``--xla_force_host_platform_device_count=8`` on CPU
(the strategy SURVEY.md §4 prescribes for the TPU build).

NOTE: in this environment an ``axon`` startup hook imports jax before any
user code, so env vars alone are too late — ``jax.config.update`` is the
reliable way to pin the backend (XLA_FLAGS is still read lazily at first
backend init, so setting it here works).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax_platforms (not jax_platform_name): the latter only sets a PREFERENCE
# and still initializes every discovered backend — when the remote TPU
# tunnel is down, that init hangs forever and the whole suite stalls.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
