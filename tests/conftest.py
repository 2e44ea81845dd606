"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding logic is validated on virtual CPU devices (the driver separately
dry-runs the multi-chip path); benchmarks run on real TPU via bench.py.
"""

import os

# The harness presets JAX_PLATFORMS=axon (the tunneled TPU); tests must run
# on local CPU — fast, deterministic, and with 8 virtual devices for sharding.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, overriding the env var — override it back before any backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def counts_df():
    from ppcseq_tpu.data.datasets import load_counts

    return load_counts()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
