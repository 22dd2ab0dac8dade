"""Physics-quality scenarios (beyond golden-value parity): stability under
gravity stacking and solver-family agreement at the statistics level."""

import numpy as np
import pytest

from gpu_physics_engine_tpu import Engine, SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine


def _settle_cfg(solver, substeps=4, **kw):
    base = dict(max_particles=64, initial_particles=64,
                world_width=16.0, world_height=32.0,
                initial_radius=0.5, gravity=(0.0, -98.0),
                substeps=substeps, sort_interval_steps=0, solver=solver)
    base.update(kw)
    return SimConfig(**base)


def _grid_positions(n, width, r):
    cols = int(width // (2 * r + 0.1))
    xs, ys = [], []
    for i in range(n):
        xs.append(0.6 + (i % cols) * (2 * r + 0.1))
        ys.append(1.0 + (i // cols) * (2 * r + 0.2))
    return np.stack([xs, ys], -1).astype(np.float32)


@pytest.mark.parametrize("solver", ["colored", "fast"])
def test_gravity_stack_settles(solver):
    """64 particles drop and settle into a pile: velocities decay, no
    explosion, bounded residual overlap (the PBD stability check)."""
    cfg = _settle_cfg(solver)
    positions = _grid_positions(64, 16.0, 0.5)
    eng = Engine.from_arrays(cfg, positions, np.full(64, 0.5, np.float32))
    eng.run(400)
    v = np.abs(eng.velocities()).max()
    assert v < 0.05, f"stack did not settle: max |v| = {v}"
    pos = eng.positions()
    assert np.isfinite(pos).all()
    # piled near the floor
    assert pos[:, 1].max() < 12.0
    # residual overlap bounded (stiffness 0.6 leaves some, never deep)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    pen = np.triu(np.maximum(1.0 - d, 0.0), 1)
    assert pen.max() < 0.35


def test_gravity_stack_settles_tiled():
    cfg = _settle_cfg("fast", pipeline="tiled", tile_cap=16,
                      mover_capacity=256)
    positions = _grid_positions(64, 16.0, 0.5)
    eng = TiledEngine.from_arrays(cfg, positions, np.full(64, 0.5, np.float32))
    eng.run(400)
    assert eng.num_particles() == 64
    v = np.abs(eng.velocities()).max()
    assert v < 0.05
    pos = eng.positions()
    assert pos[:, 1].max() < 12.0
    assert int(eng.state.overflow_count) == 0


def test_solver_families_agree_statistically():
    """Colored GS, fast Jacobi and tiled Jacobi produce the same macroscopic
    result on a dense relaxation problem (mean residual overlap), even
    though their update orders differ."""
    rng = np.random.default_rng(0)
    n = 200
    positions = rng.uniform(2.0, 30.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    def residual(pos):
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        return np.triu(np.maximum(1.0 - d, 0.0), 1).sum()

    results = {}
    base = dict(max_particles=n, initial_particles=n,
                world_width=32.0, world_height=32.0,
                initial_radius=0.5, sort_interval_steps=0)
    for solver in ("colored", "fast"):
        eng = Engine.from_arrays(SimConfig(**base, solver=solver),
                                 positions, radii)
        eng.run(50)
        results[solver] = residual(eng.positions())
    te = TiledEngine.from_arrays(
        SimConfig(**base, pipeline="tiled", tile_cap=16), positions, radii)
    te.run(50)
    results["tiled"] = residual(te.positions())

    start = residual(positions)
    for name, res in results.items():
        assert res < 0.05 * start, f"{name} left {res} of {start} overlap"
