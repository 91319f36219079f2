"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends, so this module
does it at import time (pytest imports conftest before test modules).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel, which we
# must not touch from unit tests (and which only has one chip anyway).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session's sitecustomize imports jax at interpreter start (before this
# conftest) to register the TPU-tunnel PJRT plugin, so jax has already latched
# JAX_PLATFORMS from the env; override through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
