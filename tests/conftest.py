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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call" not in _flags:
    # XLA:CPU's collective rendezvous watchdog aborts the PROCESS (F-level
    # CHECK, rendezvous.cc) when the 8 virtual devices don't all reach a
    # collective within 40s. On this 1-core box the device threads
    # timeshare one core, and a heavy interpret-mode pallas test running
    # concurrently (async dispatch) starves them well past 40s — the suite
    # died with "Fatal Python error: Aborted" ~25 min in. These are debug
    # watchdogs, not correctness checks: give them CI-scale patience.
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    )
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _drain_device_queues():
    """Serialize tests at the device level: fetch a trivial computation on
    EVERY virtual device after each test, so no async-dispatched program
    (in particular an 8-participant collective whose arrays the test
    dropped) is still in flight when the next test runs. Without this, a
    stale cross-test collective interleaves with a later heavy
    interpret-mode execution on this 1-core box and the participants
    starve — the rendezvous watchdog then kills the process ~25 min into
    the suite ("Fatal Python error: Aborted", rendezvous.cc)."""
    yield
    import jax
    import jax.numpy as jnp

    for d in jax.devices():
        (jax.device_put(jnp.zeros(()), d) + 1).block_until_ready()


@pytest.fixture(autouse=True)
def _reset_active_mesh():
    """compile_steps/tests register the context mesh in a process-global
    (parallel.mesh.set_active_mesh) so model code can route attention to the
    ring path — a test that registers a (data×context) mesh and doesn't
    reset it poisons every later meshless test: constrain_folded_rows starts
    emitting sharding constraints whose divisibility the small shapes break
    (the 14-failure cluster in the r5 full-suite logs). Reset after EVERY
    test."""
    yield
    from stlt_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)
