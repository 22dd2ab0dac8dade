"""Model registry — the engine families and scene presets in one place.

A physics engine's "models" are its simulation pipelines (how a step is
computed) and its scenes (what is simulated).  This module is the flat
index over both:

  Engine families (same physics, different execution strategies):
    * ``Engine``       — array pipelines: ``solver="colored"`` (reference
      4-color Gauss-Seidel parity), ``solver="fast"`` (gather-free
      sort+shift Jacobi), ``solver="jacobi"`` (bucket-gather cross-check),
      over ``pipeline="sorted" | "bucket"`` broad phases.
    * ``TiledEngine``  — persistent dense-tile pipeline
      (``pipeline="tiled"``), the TPU production path.
    * sharded variants — ``parallel.halo`` (sorted) and
      ``parallel.tiled_shard`` (tiled) for multi-chip meshes.

  Scenes: ``scenes.SCENES`` — the five BASELINE.json benchmark configs.

Use ``make_engine(config)`` to get the right family for a SimConfig.
"""

from gpu_physics_engine_tpu import Engine, SimConfig, StepParams, make_engine
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.scenes import SCENES, Scene, get_scene

__all__ = ["Engine", "TiledEngine", "SimConfig", "StepParams",
           "make_engine", "SCENES", "Scene", "get_scene"]
