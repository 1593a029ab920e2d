"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise the multi-chip code paths without TPU hardware (SURVEY.md §4:
"use CPU jax as the mock backend in CI").

NOTE: this environment's sitecustomize force-registers the remote "axon" TPU
backend and overrides JAX_PLATFORMS, so the env var alone is NOT enough —
jax.config.update after import is the reliable knob.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


CBOX_SCENE = "/root/reference/scenes/cbox/scene.json"


@pytest.fixture(scope="session")
def cbox_path():
    return CBOX_SCENE
