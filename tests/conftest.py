"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / the driver; unit tests validate
kernels and sharding logic on the host platform (see task notes / SURVEY.md).
Environment must be set before jax is imported anywhere.
"""

import os

# The image may set JAX_PLATFORMS=axon globally and preimport jax from
# sitecustomize, so plain env-var setdefault is too late; force the platform
# through jax.config (effective any time before backend initialization).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: XLA-CPU compiles are expensive on this
# single-core box; cache them across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def two_tone_22k():
    """1.45 s signal: 220 Hz, 330 Hz, then silence (sr=22050)."""
    sr = 22050
    t = np.arange(int(sr * 0.6)) / sr
    y = np.concatenate(
        [
            0.5 * np.sin(2 * np.pi * 220 * t),
            0.5 * np.sin(2 * np.pi * 330 * t),
            np.zeros(sr // 4),
        ]
    ).astype(np.float32)
    return y, sr
