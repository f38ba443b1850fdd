"""Test harness configuration.

Runs the whole suite on CPU with an 8-device virtual mesh (the standard JAX
trick for exercising pjit/psum/all-gather codepaths without a TPU pod —
SURVEY.md §4.4) and with x64 enabled so oracle-parity tests compare in f64.

Note: the driver environment registers the ``axon`` TPU-tunnel backend from a
``sitecustomize`` hook that imports jax before any conftest runs, so setting
``JAX_PLATFORMS`` here is too late — we must update the live jax config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache_growth():
    """The full suite compiles hundreds of executables (plus interpret-mode
    Pallas kernels); without trimming, accumulated compiler state can abort
    the CPU client late in the run.  Drop jax caches and the kernel cache
    after each test module."""
    yield
    jax.clear_caches()
    try:
        from inplacedhmc_tpu import sample as _s
        _s._KERNEL_CACHE.clear()
    except Exception:
        pass
