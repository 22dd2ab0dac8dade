"""Test harness setup: force JAX onto a virtual 8-device CPU platform.

The analog of the reference's headless WgpuContext::new_for_test
(wgpu_context.rs:73-101): the same kernels that run on TPU run here on CPU,
unchanged.  8 virtual devices let the multi-chip sharding tests build a real
jax.sharding.Mesh without hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collective rendezvous stuck-check: the 8 virtual devices
# share ONE physical core here, so under concurrent machine load a
# partition can legitimately starve for minutes inside a sharded
# program; the default terminate timeout then CHECK-aborts the whole
# process from a worker thread (xla::internal::AwaitAndLogIfStuck ->
# absl LOG(FATAL), seen as an uncatchable 'Fatal Python error:
# Aborted' with the real message swallowed by pytest's fd capture —
# diagnosed round 3 after three flaky suite deaths).  Starvation is
# not deadlock: wait loudly instead of dying.
if "collective_call_terminate_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by jit compiles of
# small fixed configs; caching them makes repeat runs several times faster.
# The directory is salted with a host-CPU fingerprint: the work tree moves
# between machines across sessions, and XLA:CPU AOT entries from a foreign
# machine LOAD rather than miss — with numerics drift that broke 1e-4
# engine-parity tolerances (utils/cache.py has the full story).
from gpu_physics_engine_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
