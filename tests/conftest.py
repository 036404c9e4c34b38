"""Test harness: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU
backend before any conftest runs, so plain env vars are snapshotted too
late — jax.config.update is required.  Tests never touch TPU hardware;
sharding paths run on 8 virtual CPU devices.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
