"""Test harness setup: force JAX onto a virtual 8-device CPU platform.

The analog of the reference's headless WgpuContext::new_for_test
(wgpu_context.rs:73-101): the same kernels that run on TPU run here on CPU,
unchanged.  8 virtual devices let the multi-chip sharding tests build a real
jax.sharding.Mesh without hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by jit compiles of
# small fixed configs; caching them makes repeat runs several times faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/gpe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
