"""Periodic Morton-order locality resort.

Replaces reference components C9-C11 (src/particles/particle_sort.rs,
particle_home_cell_ids_kernel.rs + home_cell_ids.wgsl, particle_rearrange.rs
+ rearrange.wgsl): every sort interval, particles are reordered in memory by
the Morton code of their home cell so spatially-near particles are
memory-near — on TPU that turns the broad phase's gathers/scatters into
mostly-local HBM traffic, the same locality argument as the reference's.

The three reference dispatches (compute home codes → radix sort ids →
gather through the permutation + copy back) become: encode + one stable
argsort + one fused gather of the whole SoA.  Unlike the reference, the
permutation is applied to *all* per-particle arrays including colors
(rearrange.wgsl:26-34 skips colors/home ids — vestigial there; consciously
fixed here, SURVEY.md §2.3).

Inactive slots keep UNUSED_CELL_ID keys so they sort to the tail and the
active prefix stays contiguous.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import UNUSED_CELL_ID
from gpu_physics_engine_tpu.core.state import ParticleState
from gpu_physics_engine_tpu.ops import morton
from gpu_physics_engine_tpu.ops.grid import home_cells
from gpu_physics_engine_tpu.ops.sort import argsort_u32


def home_cell_codes(x, y, active, cell_size) -> jax.Array:
    """uint32 Morton code of each particle's home cell; UNUSED for inactive.

    The analog of create_home_cell_ids (home_cell_ids.wgsl:16-34)."""
    cx, cy = home_cells(x, y, cell_size)
    code = morton.morton_encode(cx, cy)
    return jnp.where(active, code, jnp.uint32(UNUSED_CELL_ID))


def morton_resort(state: ParticleState, cell_size,
                  sort_impl: str = "lax") -> Tuple[ParticleState, jax.Array]:
    """Reorder the particle SoA by home-cell Morton code.

    Returns (resorted state, permutation) — the permutation is the analog of
    the reference's sorted particle_ids buffer (particle_sort.rs:19), exposed
    for the parity tests (tests/particle_sort.rs:44-71)."""
    active = state.active_mask()
    codes = home_cell_codes(state.x, state.y, active, cell_size)
    _, perm = argsort_u32(codes, impl=sort_impl)

    def take(a):
        return jnp.take(a, perm, axis=0)

    new_state = ParticleState(
        x=take(state.x), y=take(state.y),
        px=take(state.px), py=take(state.py),
        radius=take(state.radius),
        color=take(state.color) if state.color.shape[-1] else state.color,
        num_active=state.num_active,
        steps_since_sort=jnp.int32(0),
        max_radius=state.max_radius,
        overflow_count=state.overflow_count,
    )
    return new_state, perm
