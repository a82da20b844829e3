"""Test harness: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices — the standard JAX recipe for testing
SPMD code. Env vars must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (this image's sitecustomize) overrides JAX_PLATFORMS;
# force the CPU backend + 8 virtual devices through jax.config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# XLA CPU convs default to a low-precision (oneDNN) path with ~1e-2 abs
# error; parity tests need exact f32 accumulation. TPU runs keep the fast
# default — this applies to the test (CPU) environment only.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the supernet engine programs take minutes
# for XLA-CPU to compile on this single-core host; caching them makes
# repeat suite runs compile-free (first run pays once). ~100 MB on disk,
# gitignored.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS


@pytest.fixture(scope="session")
def golden_decode():
    import json
    with open(os.path.join(ASSETS, "golden_decode.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def arch_params():
    """Shipped searched genotype tensors (teacher=0, student=1)."""
    from fasterseg_tpu.core import ArchParams
    return {i: ArchParams.from_npz(os.path.join(ASSETS, f"arch_{i}.npz"))
            for i in (0, 1)}


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
