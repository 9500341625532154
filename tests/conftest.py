"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-device tests (DP sharding, edge-partitioned message passing) run via XLA
host-platform device emulation, per SURVEY.md §4's plan — no TPU pod needed.
Env vars must be set before jax initializes, hence module scope here.
"""
import os

# force CPU: the session env pre-sets JAX_PLATFORMS=axon (the TPU tunnel);
# unit tests must run on the emulated local mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin clobbers JAX_PLATFORMS at registration time; the config
# update below is what actually pins the tests to the emulated CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow", action="store_true", default=False,
        help="run the slow golden end-to-end tests (~5 min each)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip = pytest.mark.skip(reason="slow golden test; use --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
