"""Test harness: force an 8-device virtual CPU mesh (the standard way to
test pjit/shard_map sharding without a pod — SURVEY §4) before JAX import."""

import os
import sys

# hard override: the container environment pins JAX_PLATFORMS=axon (TPU
# tunnel) and a sitecustomize imports jax at interpreter start, so the env
# var alone is not enough — update the live config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:1])
)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_worlds_available():
    return os.path.isdir("/root/reference/uaisa_env/world")
