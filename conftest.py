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
