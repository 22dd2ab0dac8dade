"""Property fuzzing: random scenes + random interaction sequences must
preserve the engine invariants in every pipeline/solver family.

Invariants: positions finite and inside [r, world - r]; particle count
conserved except for *counted* drops (overflow_count); determinism under
replay of the same seed."""

import numpy as np
import pytest

from gpu_physics_engine_tpu import SimConfig, make_engine


def _random_config(rng) -> SimConfig:
    solver, pipeline = rng.choice(
        [("colored", "sorted"), ("colored", "bucket"),
         ("fast", "sorted"), ("jacobi", "sorted"), ("fast", "tiled")])
    n = int(rng.integers(16, 400))
    w = float(rng.uniform(32.0, 128.0))
    h = float(rng.uniform(32.0, 128.0))
    return SimConfig(
        max_particles=n + 100, initial_particles=n,
        world_width=w, world_height=h,
        initial_radius=float(rng.uniform(0.3, 0.7)),
        gravity=(float(rng.uniform(-50, 50)), float(rng.uniform(-50, 50))),
        substeps=int(rng.integers(1, 3)),
        sort_interval_steps=int(rng.choice([0, 3, 17])),
        solver=solver, pipeline=pipeline,
        max_occupancy=int(rng.integers(6, 14)),
        tile_cap=0 if pipeline == "tiled" else 24,
        tile_max_radius=3.0,
        mover_capacity=1024,
    )


@pytest.mark.parametrize("case_seed", range(8))
def test_random_scenario_invariants(case_seed):
    rng = np.random.default_rng(1000 + case_seed)
    cfg = _random_config(rng)
    eng = make_engine(cfg, seed=case_seed)
    n0 = eng.num_particles()
    spawned = 0

    for phase in range(3):
        action = rng.integers(0, 3)
        pos = (float(rng.uniform(0, cfg.world_width)),
               float(rng.uniform(0, cfg.world_height)))
        if action == 0:
            eng.press_mouse(pos)
        elif action == 1:
            eng.release_mouse()
        else:
            before = eng.num_particles()
            eng.spawn_at(pos, count=20, verbose=False)
            spawned += eng.num_particles() - before
        eng.run(int(rng.integers(3, 10)))

    p = eng.positions()
    r = eng.radii()
    assert np.isfinite(p).all(), f"non-finite positions in {cfg}"
    eps = 1e-3
    assert (p[:, 0] >= r - eps).all() and (p[:, 0] <= cfg.world_width - r + eps).all()
    assert (p[:, 1] >= r - eps).all() and (p[:, 1] <= cfg.world_height - r + eps).all()
    # conservation: everything is accounted for (live + counted drops)
    assert eng.num_particles() <= n0 + spawned
    if cfg.pipeline == "tiled":
        assert (eng.num_particles() + int(eng.state.overflow_count)
                >= n0 + spawned)
