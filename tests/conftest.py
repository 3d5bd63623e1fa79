"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding paths compile/execute without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# don't let throwaway test managers spend CPU warming neighbor-settings
# shapes (tests that exercise the warmer enable it explicitly)
os.environ.setdefault("THESIA_PRECOMPILE", "0")
# synchronous settings switches by default: the suite's hundreds of
# set_spec_setting call sites assert the post-switch state immediately.
# The deferred production path has dedicated tests (test_session.py passes
# defer=True explicitly).
os.environ.setdefault("THESIA_DEFER_SETTINGS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize pins jax_platforms to "axon,cpu"; tests run on the
# virtual 8-device CPU mesh regardless of the TPU tunnel being present
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

SAMPLES_DIR = pathlib.Path("/root/reference/samples")


@pytest.fixture(scope="session")
def samples_dir():
    return SAMPLES_DIR
