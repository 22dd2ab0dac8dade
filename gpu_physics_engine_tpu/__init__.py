"""gpu_physics_engine_tpu — a TPU-native 2D particle physics engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the wgpu+Rust
engine ``MarcVivas/gpu-physics-engine`` (reference mounted at /root/reference):
millions of circular particles, position-based Verlet integration, a uniform
spatial grid rebuilt every step, stable key sorting, prefix-sum compaction of
collision cells, a 4-color Gauss-Seidel positional collision solver, periodic
Morton-code locality resorts, interactive spawn + mouse attractor, and a
host-side point-splat viewer.

Design stance (NOT a port): the reference's per-frame choreography of encoders,
bind groups, push constants and indirect dispatches (reference src/state.rs:115-134)
collapses here into a single jitted, donated ``step(state, params) -> state``
over an SoA pytree with static capacity.  Dynamic counts (live particles,
collision cells, per-cell occupancy) are expressed with masks over static
shapes, which is what XLA wants; the hot kernels have Pallas implementations
with pure-jnp fallbacks behind the same signatures.

Layout:
  core/      SimConfig, ParticleState, the jitted stepper, Engine facade
  ops/       device kernels: morton, grid build, sort, scan, collision, verlet
  parallel/  multi-chip spatial sharding (Mesh + shard_map + ppermute halos)
  render/    camera, velocity colormap, point-splat rasterizer (C++ native + numpy)
  utils/     profiling/chrometrace, frame timer, checkpointing, input map
  app/       headless scripted runs and an optional interactive viewer loop
"""

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import ParticleState, StepParams
from gpu_physics_engine_tpu.core.engine import Engine
from gpu_physics_engine_tpu.core.tuned import (tuned_chunk, tuned_config,
                                               tuned_row)

__version__ = "0.1.0"


def make_engine(config: SimConfig, seed: int = 0):
    """Construct the right engine for config.pipeline ("tiled" gets the
    persistent-tile engine; "sorted"/"bucket" the array engine)."""
    if config.pipeline == "tiled":
        from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
        return TiledEngine(config, seed=seed)
    return Engine(config, seed=seed)


def make_tuned_engine(n_particles: int, seed: int = 0, **overrides):
    """Production tiled engine at the hardware-swept geometry for this
    size (core/tuned.py; the curve bench.py measures).  Overrides go to
    SimConfig; the run() scan chunk is set from the same table."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = tuned_config(n_particles, **overrides)
    return TiledEngine(cfg, seed=seed, chunk=tuned_chunk(n_particles))


__all__ = ["SimConfig", "ParticleState", "StepParams", "Engine",
           "make_engine", "make_tuned_engine", "tuned_config",
           "tuned_chunk", "tuned_row", "__version__"]
