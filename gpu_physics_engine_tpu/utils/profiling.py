"""Profiling: named phases, chrome-tracing export, device traces.

The reference wraps every GPU phase in wgpu-profiler scopes ("Build cell
ids", "Sort", "Solve Collisions - Color n", "Particle integration pass",
"Render pass") and, under `--features benchmark`, dumps each frame as a
chrome://tracing file benchmark.json (SURVEY.md §5; state.rs:108-112).

TPU equivalents provided here:

  * ``Profiler`` — host-side scope timer that accumulates events and
    exports the same chrome-tracing JSON format (``export_chrometrace``),
    so the "benchmark-trace parity" config of BASELINE.json has a direct
    artifact.  Scopes around async JAX dispatches measure enqueue unless
    you pass ``sync=`` — the device-true story comes from the next two.
  * ``device_trace`` — context manager around ``jax.profiler.trace``;
    produces a TensorBoard/Perfetto trace with the ``jax.named_scope``
    phase names the stepper already emits (core/stepper.py).
  * ``phase_breakdown`` — compiles each pipeline stage separately and
    times it with a device sync: the per-kernel ms table the reference
    only gets out of wgpu timestamp queries.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


class Profiler:
    def __init__(self):
        self.events: List[dict] = []
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def scope(self, name: str, sync: Optional[Callable[[], None]] = None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            end = time.perf_counter()
            self.events.append({
                "name": name, "ph": "X", "pid": 0, "tid": 0,
                "ts": (start - self._t0) * 1e6,
                "dur": (end - start) * 1e6,
            })

    def export_chrometrace(self, path: str = "benchmark.json") -> str:
        """Write accumulated scopes in chrome://tracing format
        (the reference's benchmark.json artifact, state.rs:108-112)."""
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events,
                       "displayTimeUnit": "ms"}, f)
        return path


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/gpe_tpu_trace"):
    """Capture an XLA device trace (view in TensorBoard/Perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield log_dir


def phase_breakdown(config, state, params, repeats: int = 10) -> Dict[str, float]:
    """Per-phase device milliseconds, measured with isolated jitted stages.

    Phase names mirror the reference's profiler scopes (grid.rs:324,
    collision_cell_builder.rs:227, collision_solver.rs:226-229,
    particle_integration.rs:81).
    """
    from gpu_physics_engine_tpu.ops import collision, grid, integrate, resort

    active = state.active_mask()
    cell_size = config.cell_size(state.max_radius)

    cand_fn = jax.jit(lambda: grid.build_candidates(
        state.x, state.y, state.radius, active, cell_size))
    cand = cand_fn()

    timings: Dict[str, float] = {}

    def timeit(name, fn):
        out = jax.block_until_ready(fn())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn()
        jax.block_until_ready(out)
        timings[name] = (time.perf_counter() - t0) / repeats * 1e3
        return out

    timeit("build_cell_ids", cand_fn)
    if config.pipeline == "sorted":
        pairs_fn = jax.jit(lambda: grid.sort_map(*grid.build_cell_ids(cand)))
        sc, so = timeit("sort_map", pairs_fn)
        occ_fn = jax.jit(lambda: collision.occupants_from_sorted(
            sc, so, config.max_occupancy))
        table = timeit("build_collision_cells", occ_fn)
    else:
        buckets_fn = jax.jit(lambda: grid.build_buckets(cand, config))
        buckets = timeit("build_buckets", buckets_fn)
        occ_fn = jax.jit(lambda: collision.occupants_from_buckets(buckets, config))
        table = timeit("build_collision_cells", occ_fn)

    solve_fn = jax.jit(lambda: collision.solve_colored(
        state.x, state.y, state.radius, table, jnp.float32(config.stiffness)))
    timeit("solve_collisions", solve_fn)

    integ_fn = jax.jit(lambda: integrate.verlet_integrate(
        state.x, state.y, state.px, state.py, state.radius, active,
        params, config))
    timeit("particle_integration", integ_fn)

    resort_fn = jax.jit(lambda: resort.morton_resort(state, cell_size))
    timeit("morton_resort", resort_fn)
    return timings
