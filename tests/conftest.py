"""Test configuration: force JAX onto 8 virtual CPU devices.

This is the standard multi-chip-without-a-cluster trick (SURVEY.md §4): mesh
and pjit sharding tests run against simulated devices in CI; the real TPU is
exercised by bench.py and the driver's compile checks.

NOTE: this environment pre-imports jax (sitecustomize) with
``JAX_PLATFORMS=axon``, so plain ``os.environ`` assignment in conftest is too
late — we must go through ``jax.config.update`` before any backend is
initialized. ``XLA_FLAGS`` is still read lazily at CPU-client creation, so
setting it here works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
