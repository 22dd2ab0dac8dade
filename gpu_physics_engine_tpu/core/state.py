"""Particle state pytrees.

TPU-native replacement for the reference's GPU buffer zoo:
  - ParticleBuffers SoA (reference src/particles/particle_buffers.rs:4-10:
    current_positions, previous_positions, radii, colors, home_cell_ids)
  - GpuBuffer<T> growth-on-spawn (gpu_buffer.rs:31-87)

Positions are stored as separate x/y float32 planes of static length
``config.capacity`` instead of vec2 arrays: TPU vector units tile (8,128)
f32 blocks, and a trailing dimension of 2 wastes lanes.  Dynamic particle
count is ``num_active`` + masking; "growth" is writing rows at num_active
(see ops/spawn.py), never reallocation.

The ping/pong double-buffering of the reference (particle_system.rs:17-18)
does not exist here: XLA's functional semantics + buffer donation give the
same effect for free.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "x", "y", "px", "py", "radius", "color",
        "num_active", "steps_since_sort", "max_radius", "overflow_count",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class ParticleState:
    """SoA particle state. All arrays have static leading dim = capacity."""

    x: jax.Array          # f32[cap] current position x
    y: jax.Array          # f32[cap] current position y
    px: jax.Array         # f32[cap] previous position x (Verlet)
    py: jax.Array         # f32[cap] previous position y
    radius: jax.Array     # f32[cap]; 0.0 marks an inactive slot
    color: jax.Array      # f32[cap, 4] static RGBA (parity field; may be [cap, 0])
    num_active: jax.Array       # i32[] live particle count
    steps_since_sort: jax.Array  # i32[] steps since last Morton resort
    max_radius: jax.Array       # f32[] largest live radius → cell size
    overflow_count: jax.Array   # i32[] cells that exceeded max_occupancy (diagnostic)

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    def active_mask(self) -> jax.Array:
        """bool[cap], True for live slots."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)
        return idx < self.num_active


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dt", "mouse_x", "mouse_y", "mouse_pressed"],
    meta_fields=[],
)
@dataclasses.dataclass
class StepParams:
    """Per-step dynamic inputs.

    The analog of the reference's SimParams push constants
    (particle_integration.rs:19-28): frame dt, mouse position in world
    coordinates and pressed flag.  All traced scalars — changing them does
    not recompile the step.
    """

    dt: jax.Array            # f32[]
    mouse_x: jax.Array       # f32[]
    mouse_y: jax.Array       # f32[]
    mouse_pressed: jax.Array  # f32[] 1.0 when held (particle_integration.wgsl:44)

    @staticmethod
    def make(dt: float, mouse=(0.0, 0.0), pressed: bool = False) -> "StepParams":
        return StepParams(
            dt=jnp.float32(dt),
            mouse_x=jnp.float32(mouse[0]),
            mouse_y=jnp.float32(mouse[1]),
            mouse_pressed=jnp.float32(1.0 if pressed else 0.0),
        )


def _color_shape(config: SimConfig):
    return (config.capacity, 4 if config.track_colors else 0)


def zeros(config: SimConfig) -> ParticleState:
    """An empty state at full capacity (all slots inactive)."""
    cap = config.capacity
    f32 = jnp.float32
    return ParticleState(
        x=jnp.zeros(cap, f32),
        y=jnp.zeros(cap, f32),
        px=jnp.zeros(cap, f32),
        py=jnp.zeros(cap, f32),
        radius=jnp.zeros(cap, f32),
        color=jnp.zeros(_color_shape(config), f32),
        num_active=jnp.int32(0),
        steps_since_sort=jnp.int32(0),
        max_radius=jnp.float32(config.initial_radius),
        overflow_count=jnp.int32(0),
    )


def init_uniform(config: SimConfig, key: jax.Array) -> ParticleState:
    """Initial scene: N particles uniform in the world, at rest, radius r0.

    Mirrors generate_initial_particles (particle_system.rs:102-124): uniform
    positions in [0, world) (boundary clamping happens on the first
    integration), constant radius 0.5 (random_range(0.5..=0.5)), random
    colors in [0.3, 0.8).
    """
    cap = config.capacity
    n = config.initial_particles
    r0 = config.initial_radius
    kx, ky, kc = jax.random.split(key, 3)
    active = jnp.arange(cap, dtype=jnp.int32) < n

    x = jax.random.uniform(kx, (cap,), jnp.float32, 0.0, config.world_width)
    y = jax.random.uniform(ky, (cap,), jnp.float32, 0.0, config.world_height)
    x = jnp.where(active, x, 0.0)
    y = jnp.where(active, y, 0.0)
    color = jax.random.uniform(kc, _color_shape(config), jnp.float32)

    # px/py must be distinct buffers from x/y: step() donates the whole
    # state, and aliased buffers would be donated twice.
    return ParticleState(
        x=x, y=y, px=x.copy(), py=y.copy(),
        radius=jnp.where(active, jnp.float32(r0), 0.0),
        color=color,
        num_active=jnp.int32(n),
        steps_since_sort=jnp.int32(0),
        max_radius=jnp.float32(r0),
        overflow_count=jnp.int32(0),
    )


def from_arrays(config: SimConfig, positions, radii,
                previous_positions=None, colors=None) -> ParticleState:
    """Build a state from explicit arrays — the test-fixture path.

    The analog of ParticleSystem::new_from_buffers (particle_system.rs:49-99),
    which exists in the reference precisely for golden-value tests
    (tests/common.rs:17-33).
    """
    positions = jnp.asarray(positions, jnp.float32).reshape(-1, 2)
    radii = jnp.asarray(radii, jnp.float32).reshape(-1)
    n = positions.shape[0]
    assert radii.shape[0] == n
    if previous_positions is None:
        previous_positions = positions
    previous_positions = jnp.asarray(previous_positions, jnp.float32).reshape(-1, 2)

    cap = config.capacity
    assert n <= cap, f"{n} particles exceed capacity {cap}"

    def pad(a):
        return jnp.zeros(cap, jnp.float32).at[:n].set(a)

    color = jnp.zeros(_color_shape(config), jnp.float32)
    if colors is not None and config.track_colors:
        color = color.at[:n].set(jnp.asarray(colors, jnp.float32))

    return ParticleState(
        x=pad(positions[:, 0]), y=pad(positions[:, 1]),
        px=pad(previous_positions[:, 0]), py=pad(previous_positions[:, 1]),
        radius=pad(radii),
        color=color,
        num_active=jnp.int32(n),
        steps_since_sort=jnp.int32(0),
        max_radius=jnp.float32(jnp.max(radii) if n else config.initial_radius),
        overflow_count=jnp.int32(0),
    )
