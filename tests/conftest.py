"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; we validate sharding on
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4 item 3).

NB: this image preloads jax and registers the remote-TPU ("axon") PJRT
backend from sitecustomize at interpreter startup, so env vars alone are too
late — we must also flip ``jax_platforms`` to cpu after the fact. The CPU
client is created lazily, so the XLA_FLAGS device-count override still
applies.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

# keep env and config in agreement: anything in-process that re-checks the
# env (cli._honor_jax_platforms_env) or any subprocess a test spawns must
# also land on CPU
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
