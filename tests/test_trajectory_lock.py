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


def _run(solver, pipeline="sorted", steps=40, **kw):
    cfg = SimConfig(max_particles=4096, initial_particles=4096,
                    world_width=256.0, world_height=128.0,
                    initial_radius=0.5, sort_interval_steps=16,
                    gravity=(0.0, -30.0), solver=solver, pipeline=pipeline,
                    tile_cap=16, **kw)
    eng = make_engine(cfg, seed=1234)
    eng.run(steps)
    pos = eng.positions()
    v = eng.velocities()
    return np.array([pos[:, 0].mean(), pos[:, 1].mean(),
                     pos[:, 0].std(), pos[:, 1].std(),
                     np.abs(v).mean() * 100.0])


# fingerprints: [mean_x, mean_y, std_x, std_y, 100*mean|v|], generated on
# the CPU backend (deterministic; the generator asserted two identical
# runs bit-match before recording).  A semantic regression in any solver
# family moves these by >> 1e-3; the CPU tolerance below (rtol 1e-6, ~6
# significant digits) is float-noise-tight without being fragile to
# vectorization-width differences between x86 hosts.
_EXPECTED = {
    "colored": [128.39407348632812, 58.105735778808594, 73.85853576660156,
                36.64762878417969, 17.65059471130371],
    "fast": [128.39295959472656, 58.09552764892578, 73.8560562133789,
             36.618186950683594, 17.265073776245117],
    "tiled": [127.47721099853516, 57.51222229003906, 73.82646179199219,
              36.40922546386719, 17.10873794555664],
    # the Pallas fused sweep with the uniform-radius constants.  At
    # r0 = 0.5 it is BITWISE equal to the tiled row (rsum = 1.0 and the
    # 1/2 mass split are exact: 0.3f32 == 0.6f32/2, and power-of-two
    # scaling commutes without rounding) — the shared numbers are the
    # strongest possible lock, not a copy-paste accident.
    "tiled_uniform": [127.47721099853516, 57.51222229003906,
                      73.82646179199219, 36.40922546386719,
                      17.10873794555664],
}

_KW = {"tiled_uniform": dict(tiled_collide="pallas",
                             tiled_fuse_integrate=True,
                             tiled_uniform_radius=True)}


def test_fingerprints_are_reproducible():
    """Two identical runs give identical fingerprints (pre-requisite)."""
    a = _run("fast")
    b = _run("fast")
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("name,solver,pipeline", [
    ("colored", "colored", "sorted"),
    ("fast", "fast", "sorted"),
    ("tiled", "fast", "tiled"),
    ("tiled_uniform", "fast", "tiled"),
])
def test_solver_fingerprints_locked(name, solver, pipeline):
    """Fixed-seed trajectories match the committed fingerprints.

    CPU: tight (rtol 1e-6).  Other backends (run with JAX_PLATFORMS=tpu):
    loose bounds covering reduction-order differences."""
    import jax

    fp = _run(solver, pipeline, **_KW.get(name, {}))
    expected = np.array(_EXPECTED[name])
    if jax.default_backend() == "cpu":
        np.testing.assert_allclose(fp, expected, rtol=1e-6)
    else:
        np.testing.assert_allclose(fp, expected, rtol=5e-3)


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
