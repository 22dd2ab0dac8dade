"""Device context helpers — the WgpuContext analog (R1).

The reference wraps instance/adapter/device/queue acquisition plus a
headless test context (wgpu_context.rs:16-101).  Under JAX the platform is
ambient, so this module is thin on purpose: discovery, a forced-CPU test
context (the `new_for_test` analog — same kernels, no hardware), and the
tunnel-health probe for the axon TPU relay (see CLAUDE.md).
"""

from __future__ import annotations

import os
import socket
from typing import Tuple

_RELAY_PORTS = (8082, 8083, 8087)


def device_info() -> dict:
    import jax
    dev = jax.devices()[0]
    return {
        "backend": jax.default_backend(),
        "device": str(dev),
        "platform": dev.platform,
        "device_count": jax.device_count(),
    }


def force_cpu(host_device_count: int | None = None) -> None:
    """Headless test context (WgpuContext::new_for_test analog): the same
    programs run on CPU, optionally with N virtual devices for mesh tests.
    Must be called before the first device op of the process."""
    if host_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{host_device_count}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")


def tpu_relay_alive(timeout: float = 5.0) -> bool:
    """True if the axon TPU tunnel relay accepts connections (only
    meaningful when JAX_PLATFORMS=axon; see CLAUDE.md)."""
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True
    for port in _RELAY_PORTS:
        try:
            socket.create_connection(("127.0.0.1", port), timeout=timeout).close()
            return True
        except OSError:
            continue
    return False
