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

# Persistent compile cache: the quick loop is dominated by XLA CPU compiles
# that are identical run-to-run (same shapes, same 8-device virtual mesh).
# First run pays the compiles and populates the cache; repeat runs hit it.
# Opt out with PHMRF_TEST_COMPILE_CACHE=0 (e.g. to measure cold compiles).
_test_cache = os.environ.get(
    "PHMRF_TEST_COMPILE_CACHE",
    os.path.expanduser("~/.cache/phylo_hmrf_jax_tests"))
if _test_cache and _test_cache != "0":
    jax.config.update("jax_compilation_cache_dir", _test_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    # spawned subprocesses (multiproc/elastic/CLI tests) don't import this
    # conftest — the env var makes them share the same cache
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _test_cache)

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
    interpret execution costs minutes per test. Tiers (measured on the
    single-core CI box): `pytest -m smoke` <1 min; the quick loop
    `pytest -m "not slow and not interpret"` ~5:30 with a warm compile
    cache (~13 min cold); CI runs everything.
    """
    for item in items:
        if "_pallas" in os.path.basename(str(item.fspath)):
            item.add_marker(pytest.mark.interpret)
