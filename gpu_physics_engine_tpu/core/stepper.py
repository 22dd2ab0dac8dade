"""The jitted simulation step.

This is the TPU-native collapse of the reference's per-frame choreography
(State::update, src/state.rs:115-134): Morton resort (every interval) →
grid build + sort (grid.rs:322-332) → collision-cell build + 4-color solve
(collision_system.rs:30-39) → Verlet integration (particle_integration.rs:72-93).
The reference records these across 3 queue submits per frame; here the whole
frame is ONE compiled XLA program with donated buffers — no host round-trips,
no encoder choreography, and XLA fuses the elementwise stages into their
producers.

Phases are wrapped in jax.named_scope so profiler traces show the same
phase names the reference's wgpu-profiler scopes use (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import ParticleState, StepParams
from gpu_physics_engine_tpu.ops import collision, grid, integrate, resort


def substep(state: ParticleState, params: StepParams, config: SimConfig,
            dt_scale: float = 1.0) -> ParticleState:
    """One collision-solve + integrate pass (unjitted building block)."""
    active = state.active_mask()
    cell_size = config.cell_size(state.max_radius)

    x, y = state.x, state.y
    overflow = state.overflow_count

    if config.solver == "fast":
        # builds its own fused candidate entries (positions as payloads)
        from gpu_physics_engine_tpu.ops import fast_solve
        with jax.named_scope("solve_collisions"):
            x, y, ovf = fast_solve.solve_fast(
                x, y, state.radius, active, cell_size, config)
        overflow = overflow + ovf
        cand = None
    else:
        with jax.named_scope("build_cell_ids"):
            cand = grid.build_candidates(
                state.x, state.y, state.radius, active, cell_size)

    if config.solver == "colored":
        assert cand is not None
        if config.pipeline == "sorted":
            with jax.named_scope("sort_map"):
                cell_ids, object_ids = grid.build_cell_ids(cand)
                sc, so = grid.sort_map(cell_ids, object_ids,
                                       impl=config.sort_impl)
            with jax.named_scope("build_collision_cells"):
                table = collision.occupants_from_sorted(
                    sc, so, config.max_occupancy)
        else:
            with jax.named_scope("build_buckets"):
                buckets = grid.build_buckets(cand, config)
            with jax.named_scope("build_collision_cells"):
                table = collision.occupants_from_buckets(buckets, config)
        with jax.named_scope("solve_collisions"):
            x, y = collision.solve_colored(
                x, y, state.radius, table, jnp.float32(config.stiffness))
        overflow = overflow + table.overflow
    elif config.solver == "jacobi":
        with jax.named_scope("build_buckets"):
            home_buckets = grid.build_buckets(cand, config, home_only=True)
        with jax.named_scope("solve_collisions"):
            x, y = collision.solve_jacobi(
                x, y, state.radius, home_buckets, cand, config, active)
        overflow = overflow + home_buckets.overflow

    with jax.named_scope("particle_integration"):
        scaled = dataclasses.replace(params, dt=params.dt * jnp.float32(dt_scale))
        nx, ny, npx, npy = integrate.verlet_integrate(
            x, y, state.px, state.py, state.radius, active, scaled, config)

    return dataclasses.replace(
        state, x=nx, y=ny, px=npx, py=npy, overflow_count=overflow)


def step_fn(state: ParticleState, params: StepParams,
            config: SimConfig) -> ParticleState:
    """One full frame: optional resort, then `substeps` solve+integrate passes."""

    def do_resort(s: ParticleState) -> ParticleState:
        with jax.named_scope("morton_resort"):
            new_s, _ = resort.morton_resort(
                s, config.cell_size(s.max_radius), sort_impl=config.sort_impl)
        return new_s

    if config.sort_interval_steps > 0:
        state = jax.lax.cond(
            state.steps_since_sort >= config.sort_interval_steps,
            do_resort, lambda s: s, state)

    for _ in range(config.substeps):
        state = substep(state, params, config, dt_scale=1.0 / config.substeps)

    return dataclasses.replace(
        state, steps_since_sort=state.steps_since_sort + 1)


def make_step(config: SimConfig) -> Callable[[ParticleState, StepParams], ParticleState]:
    """Compile the frame step for a fixed config (donated state buffers)."""
    return jax.jit(partial(step_fn, config=config), donate_argnums=0)
