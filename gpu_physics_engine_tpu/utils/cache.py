"""Machine-fingerprinted JAX persistent-cache directory.

The work tree migrates between container hosts across sessions while
/tmp's compile cache persists.  XLA's CPU backend stores AOT executables
whose key does NOT fully cover the host's CPU feature set: entries
compiled on a previous (different) machine still load here, with a
cpu_aot_loader warning ("machine type ... doesn't match ... could lead
to execution errors such as SIGILL") — and, observed in practice,
f32 contraction drift large enough to fail 1e-4 engine-parity tests
(tests/test_gs_tiled.py caught it).  Salting the cache directory with a
fingerprint of the host CPU + jax version makes foreign entries a clean
miss instead of a poisoned hit.
"""

from __future__ import annotations

import hashlib
import os


def cache_dir(base: str = "/tmp/gpe_tpu_jax_cache") -> str:
    """``base`` salted with a host-CPU/jax-version fingerprint.

    The salt hashes the ENTIRE first-processor /proc/cpuinfo block PLUS
    the kernel boot_id.  History (do not weaken it): round 2 proved the
    ISA-flags line alone is not enough (identical flag lines, different
    LLVM target CPUs -> foreign AOT entries loaded and drifted f32
    results past test tolerances).  boot_id is defense-in-depth on top
    of the cpuinfo block: it changes on every VM (re)start, so any
    possible host migration — including one that clones /proc/cpuinfo
    bitwise while LLVM's direct CPUID detection differs — invalidates
    the cache unconditionally.  Cost: a cold cache per boot, re-warmed
    by one full-suite run.

    Reading cpu_aot_loader warnings: a pair of "+prefer-no-scatter /
    +prefer-no-gather ... not supported on the host" warnings appears
    on EVERY AOT load, including perfectly healthy same-machine /
    same-process ones — those two are XLA pseudo-features that the
    host CPUID probe never reports; they are NOT evidence of a foreign
    entry (a round-3 session misread them as one while chasing a
    suite abort whose true cause was the CPU collective rendezvous
    stuck-check — see tests/conftest.py).
    """
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            block = []
            for ln in f:
                if not ln.strip():
                    break  # end of first processor block
                block.append(ln)
            cpu = "".join(block)
    except OSError:
        cpu = ""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        boot = ""
    import jax
    import jaxlib
    fp = hashlib.md5(
        (platform.machine() + cpu + boot + jax.__version__
         + jaxlib.__version__).encode()).hexdigest()[:10]
    return f"{base}_{fp}"


def enable_persistent_cache(min_compile_secs: float = 0.5,
                            base: str = "/tmp/gpe_tpu_jax_cache",
                            salt: bool = True) -> str:
    """Point JAX's persistent compilation cache at the cache directory
    (honoring an explicit JAX_COMPILATION_CACHE_DIR override) and return
    the directory used.

    ``salt=True`` (default) uses the host-fingerprinted directory — the
    safe choice for anything that may run XLA:CPU (foreign CPU-AOT
    entries load and drift, see module docstring).  ``salt=False`` uses
    ``base`` directly: the TPU-tunnel scripts share one unsalted dir so
    probe-warmed remote-compile entries pre-warm the driver bench
    (remote-TPU entries carry no foreign-machine CPU-AOT risk)."""
    import jax
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or (
        cache_dir(base) if salt else base)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
