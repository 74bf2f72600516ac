"""Test harness config: force an 8-virtual-device CPU mesh so sharding
tests run without TPU hardware (SURVEY.md section 4: shard-count
invariance is validated on xla_force_host_platform_device_count)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the production multi-pop walk default (walk_pops=4) multiplies the
# per-step math the Pallas INTERPRETER executes eagerly, roughly
# doubling suite wall time; tests pin pops=1 and cover 2/4 explicitly
# (test_packet_wide.test_multi_pop_matches_perlane)
os.environ.setdefault("SRT_POPS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU sitecustomize force-selects its backend at interpreter
# start; override back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the full (slow, compile-heavy) test lane too",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full: slow compile-heavy tests; default lane skips them "
        "(opt in with --full or SRT_FULL_TESTS=1)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("SRT_FULL_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="full lane only (--full / SRT_FULL_TESTS=1)")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
