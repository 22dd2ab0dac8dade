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
    from functools import partial

    from gpu_physics_engine_tpu.ops import collision, grid, integrate, resort

    active = state.active_mask()
    cell_size = config.cell_size(state.max_radius)

    timings: Dict[str, float] = {}

    def _drain(out):
        # Host-fetch one scalar: the only reliable device sync on tunneled
        # runtimes (block_until_ready can return before remote completion).
        leaf = jax.tree_util.tree_leaves(out)[0]
        np_leaf = jnp.ravel(leaf)[0] if leaf.ndim else leaf
        float(jnp.real(np_leaf.astype(jnp.float32)))

    def timeit(name, fn, *args):
        fn = jax.jit(fn)
        out = fn(*args)
        _drain(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn(*args)
        _drain(out)
        timings[name] = (time.perf_counter() - t0) / repeats * 1e3
        return out

    # dispatch-overhead baseline: a null program through the same path
    timeit("(dispatch overhead)", lambda x: x + 1.0, jnp.float32(0.0))

    cand = timeit(
        "build_cell_ids",
        lambda x, y, r, a: grid.build_candidates(x, y, r, a, cell_size),
        state.x, state.y, state.radius, active)

    if config.pipeline == "sorted":
        sc, so = timeit(
            "sort_map",
            lambda c: grid.sort_map(*grid.build_cell_ids(c),
                                    impl=config.sort_impl),
            cand)
        table = timeit(
            "build_collision_cells",
            partial(collision.occupants_from_sorted, K=config.max_occupancy),
            sc, so)
    else:
        buckets = timeit(
            "build_buckets", partial(grid.build_buckets, config=config), cand)
        table = timeit(
            "build_collision_cells",
            partial(collision.occupants_from_buckets, config=config), buckets)

    timeit(
        "solve_collisions",
        partial(collision.solve_colored, stiffness=jnp.float32(config.stiffness)),
        state.x, state.y, state.radius, table)

    timeit(
        "particle_integration",
        lambda x, y, px, py, r, a, p: integrate.verlet_integrate(
            x, y, px, py, r, a, p, config),
        state.x, state.y, state.px, state.py, state.radius, active, params)

    timeit("morton_resort",
           lambda s: resort.morton_resort(s, cell_size), state)
    return timings


def tiled_phase_breakdown(config, state, params, repeats: int = 5,
                          errors: Optional[Dict[str, str]] = None,
                          ) -> Dict[str, float]:
    """Per-phase device ms for the persistent tiled pipeline.

    The returned dict is float-only (NaN marks a phase whose backend
    failed to compile); pass ``errors={}`` to also collect the exception
    type per failed phase."""
    from functools import partial

    from gpu_physics_engine_tpu.ops import tiled
    from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas

    timings: Dict[str, float] = {}

    def _drain(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np_leaf = jnp.ravel(leaf)[0] if leaf.ndim else leaf
        float(jnp.real(np_leaf.astype(jnp.float32)))

    def timeit(name, fn, *args):
        try:  # keep the other phases' numbers if one backend can't compile
            fn = jax.jit(fn)
            out = fn(*args)
            _drain(out)
            t0 = time.perf_counter()
            for _ in range(repeats):
                out = fn(*args)
            _drain(out)
            timings[name] = (time.perf_counter() - t0) / repeats * 1e3
        except Exception as e:
            timings[name] = float("nan")
            if errors is not None:
                errors[name] = f"{type(e).__name__}"

    from gpu_physics_engine_tpu.ops.tiled_pallas import (
        collide_integrate_pallas, relocate_pallas)

    timeit("(dispatch overhead)", lambda s: s.x + 1.0, state)
    timeit("relocate (claim/jnp)", partial(tiled.relocate, config=config),
           state)
    timeit("relocate (pull/pallas)",
           partial(relocate_pallas, config=config), state)
    timeit("collide (jnp)", partial(tiled.collide, config=config), state)
    timeit("collide (pallas)", partial(collide_pallas, config=config), state)
    timeit("collide+integrate (fused)",
           lambda s, p: collide_integrate_pallas(s, p, config),
           state, params)
    timeit("particle_integration",
           lambda s, p: tiled.integrate(s, p, config), state, params)
    if config.tiled_solver == "gs":
        # the reference-parity solver (frozen-membership 4-color GS) in
        # the configured layout — rank + 4x(solve+apply) (+ relayouts
        # for gs_layout="mx"/"dec"); see PERF.md "GS parity solver"
        from gpu_physics_engine_tpu.ops.gs_pallas import gs_solve_pallas
        timeit("gs_solve (pallas, gs_layout=%s)" % config.gs_layout,
               partial(gs_solve_pallas, config=config), state)
    return timings
