"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the axon site hook forces JAX_PLATFORMS=axon at import; config.update wins
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_DIR = "/root/reference"
EXAMPLE_INPUT = os.path.join(REFERENCE_DIR, "example_input")


@pytest.fixture(scope="session")
def example_tree():
    from phylo_hmrf_tpu.tree import load_tree
    return load_tree(
        os.path.join(EXAMPLE_INPUT, "edge.1.txt"),
        os.path.join(EXAMPLE_INPUT, "branch_length.1.txt"),
        os.path.join(EXAMPLE_INPUT, "species_name.1.txt"),
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Auto-mark the Pallas interpret-mode gates (test_*_pallas.py): CPU
    interpret execution costs minutes per test. Quick iteration loop:
    `pytest -m "not slow and not interpret"` (~5 min); CI runs everything.
    """
    for item in items:
        if "_pallas" in os.path.basename(str(item.fspath)):
            item.add_marker(pytest.mark.interpret)
