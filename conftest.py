"""Repo-root conftest: make the package importable and pick the test backend.

Tests run on CPU with a faked 8-device platform so the data-parallel path is
exercised without a TPU pod (standard JAX practice, SURVEY.md §5). These env
vars must be set before jax initializes, hence a root conftest.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

# The container env pins JAX_PLATFORMS=axon (the tunneled TPU plugin) and its
# sitecustomize imports jax at interpreter startup, so env vars set here are
# too late for jax's config — use jax.config.update instead. XLA_FLAGS is
# read at backend *initialization*, which has not happened yet, so the env
# var still works for the faked 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's 25 minutes are almost
# entirely CPU compiles of the same FCN-8/DAE graphs on every run. With the
# cache, unchanged tests re-run in seconds. Keyed by HLO + jax/XLA version,
# so code changes recompile exactly what they touch. Safe to delete anytime.
_cache_dir = os.environ.get(
    "JAX_TEST_COMPILATION_CACHE",
    os.path.join(os.path.dirname(__file__), ".jax_compile_cache"),
)
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
