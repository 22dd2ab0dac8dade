"""Big-particle overlay: heterogeneous radii without re-tiling.

The reference reacts to an interactive spawn (radius 1-3 integers,
particle_system.rs:163-220) by growing cell_size to 2.2 x max_radius and
rebuilding every grid buffer (grid.rs:265-291) — fine when the whole
engine re-allocates per frame, ruinous for the persistent tile pipeline:
re-tiling a 1M+ scene for a radius-3 spawn inflates tile area ~36x and
the auto cap past 40, and the unrolled cap^2 band kernels cannot compile
there (PERF.md: cap>16 scales scoped VMEM steeply).

TPU-native answer: two-level storage.  The tile grid keeps its
production geometry (sized for the common small radius); the RARE large
particles (spawn bursts: ~100/burst vs millions of smalls) live in a
small dense side array and couple to the grid through per-big gather
windows:

  * big-big: all-pairs masked Jacobi corrections on [B] arrays — B is a
    few thousand, B^2 pair math is microseconds on the VPU.
  * big-small: every big gathers the [cap, 2W+1, 2W+1] tile window
    around its home tile (vmapped dynamic_slice — a gather of ~B*cap*
    (2W+1)^2 elements, tiny), runs the pair math against every occupant,
    accumulates its own correction and scatter-adds the partners'
    corrections back to their slots.  W is STATIC from the config
    (ceil((spawn_radius_max + r_small + hysteresis) / tile_edge)), so
    shapes never depend on data.

Corrections are Jacobi (computed from frozen positions, applied
additively) with the reference stiffness split by inverse mass
(collision_solver.wgsl:91-111) — the same modeling family as the
production tiled sweep.  Coupling runs once per step before the tile
solve; the Verlet integrate then picks the velocity up implicitly.

This is the spawn path's default (core/tiled_engine.py::spawn_at routes
radii that exceed the tile geometry here); the reference-faithful
re-tile remains available as SimConfig.tiled_spawn="retile".
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import StepParams
from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry

_I32 = jnp.int32
MIN_DISTANCE = 1e-4  # collision_solver.wgsl:95


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "px", "py", "radius", "pid", "num_active"],
    meta_fields=[],
)
@dataclasses.dataclass
class BigState:
    """Dense overlay state ([B] per field; pid -1 marks an empty slot)."""
    x: jax.Array
    y: jax.Array
    px: jax.Array
    py: jax.Array
    radius: jax.Array
    pid: jax.Array
    num_active: jax.Array  # i32[]

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    def occupied(self):
        return self.pid >= 0


def init_bigs(capacity: int) -> BigState:
    z = jnp.zeros((capacity,), jnp.float32)
    return BigState(x=z, y=z, px=z, py=z, radius=z,
                    pid=jnp.full((capacity,), -1, _I32),
                    num_active=jnp.int32(0))


def window_halfwidth(config: SimConfig) -> int:
    """Static tile-window half-width so every possible big-small pair is
    inside the gather: bigs reach spawn_radius_max, partners reach
    r_small + the pull-relocate staleness band past their storage tile
    (hysteresis plus the relocate interval's reserved off-step drift)."""
    t, TY, TX = tile_geometry(config)
    reach = (config.spawn_radius_max + config.tile_max_radius_effective
             + config.hysteresis_delta
             + (config.tiled_relocate_interval - 1) * config.drift_budget)
    w = int(math.ceil(reach / t))
    # the window must not wrap (a wrapped roll view would visit a tile
    # twice and double-count its pairs)
    w_max = (min(TY, TX) - 1) // 2
    clamped = max(1, min(w, w_max))
    if clamped < w and not (2 * clamped + 1 >= TY
                            and 2 * clamped + 1 >= TX):
        # an under-sized window would silently skip real big-small
        # pairs (no overflow counter would see it) — refuse instead
        raise ValueError(
            f"grid ({TY}x{TX} tiles, edge {t:.3g}) is too small for the "
            f"big-particle gather window (need half-width {w}, max "
            f"{clamped} without wrapping); use tiled_spawn='retile' or "
            "a larger world for oversized spawns at this scale")
    return clamped


def _pair(dx, dy, ri, rj, stiffness):
    """Weighted pair corrections for a separation (dx, dy) — delegates to
    ops/collision._pair_correction, the single home of the reference
    pair formula (collision_solver.wgsl:91-111).  Returns
    (dxi, dyi, dxj, dyj, colliding): apply +(dxi, dyi) to i and
    -(dxj, dyj) to j."""
    from gpu_physics_engine_tpu.ops.collision import _pair_correction
    return _pair_correction(dx, dy, ri,
                            jnp.zeros_like(dx), jnp.zeros_like(dy), rj,
                            stiffness)


def couple_bigs(tiles: TileState, big: BigState,
                config: SimConfig) -> Tuple[TileState, BigState]:
    """One Jacobi coupling pass: big-big and big-small positional
    corrections from frozen positions.  Returns updated (tiles, big)."""
    stiffness = jnp.float32(config.stiffness)
    bocc = big.occupied()
    bx, by, br = big.x, big.y, big.radius

    # ---- big-big: all pairs on [B] ----
    dx = bx[:, None] - bx[None, :]
    dy = by[:, None] - by[None, :]
    cxi, cyi, _, _, hit = _pair(dx, dy, br[:, None], br[None, :], stiffness)
    B = big.capacity
    valid = (hit & bocc[:, None] & bocc[None, :]
             & ~jnp.eye(B, dtype=bool))
    dbx = jnp.sum(jnp.where(valid, cxi, 0.0), axis=1)
    dby = jnp.sum(jnp.where(valid, cyi, 0.0), axis=1)

    # ---- big-small: per-big gather window over the tile grid ----
    t, TY, TX = tile_geometry(config)
    cap = tiles.dims[0]
    W = window_halfwidth(config)
    win = 2 * W + 1
    tf = jnp.float32(t)
    sy = jnp.clip(jnp.floor(by / tf).astype(_I32) + 1 - W, 0, TY - win)
    sx = jnp.clip(jnp.floor(bx / tf).astype(_I32) + 1 - W, 0, TX - win)

    def gather(arr, syi, sxi):
        return jax.lax.dynamic_slice(arr, (0, syi, sxi), (cap, win, win))

    gx = jax.vmap(gather, in_axes=(None, 0, 0))(tiles.x, sy, sx)
    gy = jax.vmap(gather, in_axes=(None, 0, 0))(tiles.y, sy, sx)
    gr = jax.vmap(gather, in_axes=(None, 0, 0))(tiles.radius, sy, sx)
    gp = jax.vmap(gather, in_axes=(None, 0, 0))(tiles.pid, sy, sx)

    ddx = bx[:, None, None, None] - gx
    ddy = by[:, None, None, None] - gy
    sxi, syi, sxj, syj, shit = _pair(
        ddx, ddy, br[:, None, None, None], gr, stiffness)
    svalid = shit & bocc[:, None, None, None] & (gp >= 0)
    dbx = dbx + jnp.sum(jnp.where(svalid, sxi, 0.0), axis=(1, 2, 3))
    dby = dby + jnp.sum(jnp.where(svalid, syi, 0.0), axis=(1, 2, 3))

    # partners' share scattered back into the grid (flat 1D indices —
    # 2-index advanced indexing is ~100 ms/pass on TPU, DESIGN.md)
    k = jnp.arange(cap, dtype=_I32)[None, :, None, None]
    wy = jnp.arange(win, dtype=_I32)[None, None, :, None]
    wx = jnp.arange(win, dtype=_I32)[None, None, None, :]
    flat = (k * TY * TX + (sy[:, None, None, None] + wy) * TX
            + (sx[:, None, None, None] + wx)).reshape(-1)
    updx = jnp.where(svalid, -sxj, 0.0).reshape(-1)
    updy = jnp.where(svalid, -syj, 0.0).reshape(-1)
    nx = tiles.x.reshape(-1).at[flat].add(updx).reshape(tiles.dims)
    ny = tiles.y.reshape(-1).at[flat].add(updy).reshape(tiles.dims)

    tiles = dataclasses.replace(tiles, x=nx, y=ny)
    big = dataclasses.replace(
        big, x=jnp.where(bocc, bx + dbx, bx),
        y=jnp.where(bocc, by + dby, by))
    return tiles, big


def integrate_bigs(big: BigState, params: StepParams, config: SimConfig,
                   dt_scale: float = 1.0) -> BigState:
    """Verlet + mouse attractor + world clamp on the overlay (same
    equation as ops/tiled.integrate / particle_integration.wgsl:24-77)."""
    occ = big.occupied()
    vel_x = big.x - big.px
    vel_y = big.y - big.py
    gxc = jnp.float32(config.gravity[0])
    gyc = jnp.float32(config.gravity[1])
    dxm = params.mouse_x - big.x
    dym = params.mouse_y - big.y
    dist = jnp.sqrt(dxm * dxm + dym * dym)
    inv = jnp.where(dist > 1e-6, 1.0 / jnp.maximum(dist, 1e-6), 0.0)
    strength = jnp.float32(config.mouse_strength) * params.mouse_pressed
    ax = gxc + dxm * inv * strength
    ay = gyc + dym * inv * strength
    dt = params.dt * jnp.float32(dt_scale)
    dt2 = dt * dt
    nx = big.x + vel_x + ax * dt2
    ny = big.y + vel_y + ay * dt2
    from gpu_physics_engine_tpu.ops.integrate import apply_world_constraint
    nx, ny = apply_world_constraint(nx, ny, big.radius, config)
    return dataclasses.replace(
        big,
        x=jnp.where(occ, nx, big.x),
        y=jnp.where(occ, ny, big.y),
        px=jnp.where(occ, big.x, big.px),
        py=jnp.where(occ, big.y, big.py),
    )


def hybrid_step_fn(tiles: TileState, big: BigState, params: StepParams,
                   config: SimConfig, do_relocate: bool = True
                   ) -> Tuple[TileState, BigState]:
    """Full frame with the overlay: couple (Jacobi cross terms), then the
    standard tile step (relocate -> solve -> integrate), then integrate
    the bigs.  Coupling runs once per frame regardless of substeps (the
    overlay is a spawn-scene feature; spawn scenes run substeps=1).
    ``do_relocate`` forwards the SimConfig.tiled_relocate_interval
    off-step to the tile phase (coupling itself is storage-agnostic: the
    big<->tile cross terms search the big's 3x3 STORAGE neighborhood,
    which the interval keeps within the same staleness bound as the
    collide window)."""
    from gpu_physics_engine_tpu.ops.tiled import tiled_step_fn
    tiles, big = couple_bigs(tiles, big, config)
    tiles = tiled_step_fn(tiles, params, config, do_relocate=do_relocate)
    # mirror the tile integration's substep split (dt/substeps each) so
    # bigs and smalls accumulate the same per-frame gravity displacement
    for _ in range(config.substeps):
        big = integrate_bigs(big, params, config,
                             dt_scale=1.0 / config.substeps)
    return tiles, big


def export_bigs(big: BigState):
    """(pids, positions, previous, radii) of live overlay particles,
    ascending pid (numpy, host)."""
    import numpy as np
    pid = np.asarray(big.pid)
    live = pid >= 0
    order = np.argsort(pid[live], kind="stable")
    pos = np.stack([np.asarray(big.x)[live], np.asarray(big.y)[live]], -1)
    prev = np.stack([np.asarray(big.px)[live], np.asarray(big.py)[live]], -1)
    rad = np.asarray(big.radius)[live]
    return (pid[live][order], pos[order], prev[order], rad[order])
