"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The image's sitecustomize registers the axon TPU plugin and sets
JAX_PLATFORMS=axon at interpreter start (before conftest runs), so setting
the env var here is too late — jax is already imported.  Instead override
via jax.config before any backend initializes: tests must run on CPU (the
TPU tunnel makes per-test compiles take minutes), and sharding tests need
the 8 virtual CPU devices.
"""

import os

# XLA_FLAGS is read at CPU-client init (lazy), so this still takes effect.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
