"""Test config: run everything on a virtual 8-device CPU mesh so sharding
tests exercise the same pjit programs that run on a real TPU slice.

Note: on this image the TPU plugin ignores the JAX_PLATFORMS env var, so
we must also force the platform through jax.config after import.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices time-share ONE host core here: an 8-way collective
# rendezvous can starve a participant past XLA's terminate timeout, which
# LOG(FATAL)s the whole process ("Fatal Python error: Aborted" mid-suite).
# Give the rendezvous effectively unlimited patience — starvation on this
# box is scheduling noise, not deadlock.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Synchronous CPU dispatch: with async dispatch, concurrently in-flight
# multi-device programs park per-device executions at collective
# rendezvous and the 1-core host's thread pool can strand program N's
# participants behind program N+1's — a resource deadlock (reproduced
# twice: suite wedged at 0% CPU; before the rendezvous-timeout raise it
# manifested as the mystery mid-suite SIGABRT). Real TPUs pipeline in
# per-device hardware queues and keep full async dispatch.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
