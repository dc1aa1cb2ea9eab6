"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices.  jax may already be imported by the
environment's sitecustomize (TPU plugin), so we switch platform via
jax.config, which works post-import as long as no backend has been used.

Set HDT_TEST_TPU=1 to run the suite against the real TPU instead.
"""

import os
import sys

if os.environ.get("HDT_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: repeat test runs skip recompiles
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/hdt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
