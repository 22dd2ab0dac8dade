"""Interactive particle spawning.

Replaces the reference spawn path (SURVEY.md §3.4): key `P` pushes 100
particles into every GpuBuffer with capacity-doubling reallocation and
rebinds every kernel (particle_system.rs:163-220, gpu_buffer.rs:49-87,
state.rs:187-200).  Here capacity is static, so a spawn is just a
``dynamic_update_slice`` of `burst` rows at ``num_active`` plus a counter
bump — jittable, no reallocation, no "refresh" cascade.

Spawn geometry matches the reference ring (particle_system.rs:163-196):
particle i lands at mouse + polar(angle ~ U[0, tau), dist ~ U[10, 50+1.5*i]),
with integer radius ~ U{1, 2, 3} and color channels ~ U[0.3, 1.0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import ParticleState

_RING_MIN_DIST = 10.0
_RING_MAX_DIST_BASE = 50.0
_RING_MAX_DIST_STEP = 1.5


def ring_burst(key: jax.Array, mouse_x, mouse_y, count: int,
               max_spawn_radius: int = 3):
    """Spawn geometry shared by every engine family.

    Returns (x[count], y[count], radii[count]): positions on a widening
    ring around the cursor (particle i at distance U[10, 50 + 1.5*i]),
    radii uniform integers in {1..max_spawn_radius}
    (particle_system.rs:163-196)."""
    ka, kd, kr = jax.random.split(key, 3)
    i = jnp.arange(count, dtype=jnp.float32)
    angle = jax.random.uniform(ka, (count,), jnp.float32, 0.0, 2.0 * jnp.pi)
    max_dist = _RING_MAX_DIST_BASE + i * _RING_MAX_DIST_STEP
    dist = _RING_MIN_DIST + jax.random.uniform(kd, (count,), jnp.float32) * (
        max_dist - _RING_MIN_DIST)
    sx = mouse_x + dist * jnp.cos(angle)
    sy = mouse_y + dist * jnp.sin(angle)
    radii = jax.random.randint(
        kr, (count,), 1, max_spawn_radius + 1).astype(jnp.float32)
    return sx, sy, radii


@partial(jax.jit, static_argnames=("config", "count"), donate_argnums=1)
def add_particles(config: SimConfig, state: ParticleState, key: jax.Array,
                  mouse_x, mouse_y, count: int | None = None) -> ParticleState:
    """Spawn a burst of `count` particles in a ring around the mouse.

    If the burst would exceed capacity the whole burst is dropped (the
    reference reallocates instead; with static capacity, refusing is the
    honest behavior — callers can size max_particles for their scene).
    """
    count = count if count is not None else config.spawn_burst
    kring, kc = jax.random.split(key)
    sx, sy, radii = ring_burst(kring, mouse_x, mouse_y, count)

    fits = state.num_active + count <= config.max_particles
    start = state.num_active

    def upd(dst, src):
        new = jax.lax.dynamic_update_slice(dst, src, (start,))
        return jnp.where(fits, new, dst)

    color = state.color
    if color.shape[-1]:
        ccol = jax.random.uniform(kc, (count, 4), jnp.float32, 0.3, 1.0)
        ccol = ccol.at[:, 3].set(1.0)
        new_color = jax.lax.dynamic_update_slice(color, ccol, (start, 0))
        color = jnp.where(fits, new_color, color)

    return ParticleState(
        x=upd(state.x, sx), y=upd(state.y, sy),
        px=upd(state.px, sx), py=upd(state.py, sy),
        radius=upd(state.radius, radii),
        color=color,
        num_active=jnp.where(fits, state.num_active + count, state.num_active),
        steps_since_sort=state.steps_since_sort,
        max_radius=jnp.where(fits, jnp.maximum(state.max_radius, jnp.max(radii)),
                             state.max_radius),
        overflow_count=state.overflow_count,
    )
