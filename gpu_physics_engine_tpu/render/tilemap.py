"""Device-side tile-map visualization for the persistent tiled pipeline.

The full-resolution viewer path downloads every particle (96 MB at 4M,
~2 s of host rasterization); for interactive monitoring of large scenes
that is the wrong split.  The tiled engine's storage is already a spatial
histogram, so a frame can be AGGREGATED on device — per tile: occupant
count, mean velocity magnitude — and only the [TY, TX, 2] f32 map
(~5 MB at the 4M geometry, ~250 KB at 1M) crosses the host boundary.
The host then upsamples and applies the reference's velocity colormap
(particle_drawer.wgsl:39-67) with a density-driven alpha, giving a
faithful "what is the sim doing" frame at interactive rates where the
splat viewer takes seconds.

Pure jnp reductions over the CAP axis — XLA fuses them into one pass over
the state; no Pallas needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_physics_engine_tpu.ops.tiled import TileState
from gpu_physics_engine_tpu.render.colormap import (
    COLOR_HIGH, COLOR_LOW, COLOR_MID, MAX_VELOCITY, smoothstep)


@jax.jit
def tile_stats(state: TileState) -> Tuple[jax.Array, jax.Array]:
    """([TY, TX] occupant count, [TY, TX] mean |v| over occupants)."""
    occ = state.occupied()
    count = jnp.sum(occ.astype(jnp.int32), axis=0)
    vx = state.x - state.px
    vy = state.y - state.py
    speed = jnp.where(occ, jnp.sqrt(vx * vx + vy * vy), 0.0)
    mean_v = jnp.sum(speed, axis=0) / jnp.maximum(count, 1).astype(
        jnp.float32)
    return count, mean_v


def render_tilemap(state: TileState, scale: int = 1,
                   cap_reference: int | None = None) -> np.ndarray:
    """[TY*scale, TX*scale, 3] uint8 frame: velocity colormap weighted by
    tile density (vacant tiles are black, like the reference clear color).

    cap_reference sets the count treated as "full" for the brightness
    ramp; defaults to the state's slot capacity."""
    count, mean_v = tile_stats(state)
    count = np.asarray(count)[1:-1, 1:-1]      # drop the border ring
    mean_v = np.asarray(mean_v)[1:-1, 1:-1]
    cap = cap_reference or state.dims[0]

    t = np.clip(mean_v / MAX_VELOCITY, 0.0, 1.0)
    s1 = smoothstep(0.0, 0.5, t)[..., None]
    s2 = smoothstep(0.5, 1.0, t)[..., None]
    color = COLOR_LOW * (1.0 - s1) + COLOR_MID * s1
    color = color * (1.0 - s2) + COLOR_HIGH * s2
    density = np.clip(count / float(cap), 0.0, 1.0)[..., None]
    frame = (color * density * 255.0).astype(np.uint8)
    frame = frame[::-1]  # world y-up -> image row 0 at the top
    if scale > 1:
        frame = np.repeat(np.repeat(frame, scale, axis=0), scale, axis=1)
    return frame
