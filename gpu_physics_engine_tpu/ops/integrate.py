"""Position-based Verlet integration + boundary constraint.

Replaces reference component C8 (src/particles/particle_integration.rs,
particle_integration.wgsl:24-77).  Same update equation:

    velocity  = current - previous            (no dt division — position Verlet)
    accel     = gravity + mouse attraction    (normalize(mouse-pos) * strength)
    predicted = current + velocity + accel * dt^2
    previous  = current
    predicted clamped to [radius, world - radius] per axis

The reference couples `velocity` to the real frame cadence (SURVEY.md §2.3);
here dt is an explicit StepParams field (fixed by default) so trajectories
are reproducible, while the equation itself is unchanged.  One fused
elementwise op over the SoA planes — XLA melts this into the surrounding
step; no separate "kernel" is needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import StepParams


def apply_world_constraint(nx, ny, radius, config: SimConfig):
    """Boundary constraint: box clamp (particle_integration.wgsl:68-71) or
    the circular world the reference carries commented out
    (particle_integration.wgsl:79-92): project escapees onto the largest
    inscribed circle."""
    if config.world_shape == "circle":
        cx = jnp.float32(config.world_width / 2.0)
        cy = jnp.float32(config.world_height / 2.0)
        world_r = jnp.float32(min(config.world_width, config.world_height) / 2.0)
        dx = nx - cx
        dy = ny - cy
        d2 = dx * dx + dy * dy
        max_r = world_r - radius
        outside = d2 > max_r * max_r
        inv = 1.0 / jnp.sqrt(jnp.maximum(d2, 1e-12))
        nx = jnp.where(outside, cx + max_r * dx * inv, nx)
        ny = jnp.where(outside, cy + max_r * dy * inv, ny)
        return nx, ny
    nx = jnp.clip(nx, radius, jnp.float32(config.world_width) - radius)
    ny = jnp.clip(ny, radius, jnp.float32(config.world_height) - radius)
    return nx, ny


def verlet_integrate(
    x, y, px, py, radius, active, params: StepParams, config: SimConfig
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (new_x, new_y, new_px, new_py)."""
    vel_x = x - px
    vel_y = y - py

    gx = jnp.float32(config.gravity[0])
    gy = jnp.float32(config.gravity[1])

    # Mouse attractor (particle_integration.wgsl:44-55).  The reference's
    # normalize() NaNs at zero distance; we guard with MIN eps (documented
    # deviation — affects only the particle exactly under the cursor).
    dx = params.mouse_x - x
    dy = params.mouse_y - y
    dist = jnp.sqrt(dx * dx + dy * dy)
    inv = jnp.where(dist > 1e-6, 1.0 / jnp.maximum(dist, 1e-6), 0.0)
    strength = jnp.float32(config.mouse_strength) * params.mouse_pressed
    ax = gx + dx * inv * strength
    ay = gy + dy * inv * strength

    dt2 = params.dt * params.dt
    nx = x + vel_x + ax * dt2
    ny = y + vel_y + ay * dt2

    nx, ny = apply_world_constraint(nx, ny, radius, config)

    nx = jnp.where(active, nx, x)
    ny = jnp.where(active, ny, y)
    new_px = jnp.where(active, x, px)
    new_py = jnp.where(active, y, py)
    return nx, ny, new_px, new_py
