"""Spawn-burst tests (reference add_particles path, particle_system.rs:163-220)."""

import numpy as np

from gpu_physics_engine_tpu import Engine, SimConfig


def _cfg(**kw):
    base = dict(max_particles=1024, initial_particles=100,
                world_width=512.0, world_height=512.0,
                initial_radius=0.5, sort_interval_steps=0)
    base.update(kw)
    return SimConfig(**base)


def test_burst_count_and_geometry():
    eng = Engine(_cfg(), seed=0)
    center = (256.0, 256.0)
    eng.spawn_at(center)
    assert eng.num_particles() == 200
    spawned = eng.positions()[100:]
    d = np.linalg.norm(spawned - np.asarray(center), axis=-1)
    # ring: dist in [10, 50 + 1.5*99] (particle_system.rs:170-180)
    assert (d >= 10.0 - 1e-4).all()
    assert (d <= 50.0 + 1.5 * 99 + 1e-3).all()


def test_spawn_radii_are_integers_1_to_3():
    eng = Engine(_cfg(), seed=1)
    eng.spawn_at((256.0, 256.0))
    r = eng.radii()[100:]
    assert set(np.unique(r)).issubset({1.0, 2.0, 3.0})
    assert float(eng.state.max_radius) == r.max()


def test_spawn_updates_cell_size():
    eng = Engine(_cfg(), seed=2)
    cs0 = eng.cell_size()
    eng.spawn_at((256.0, 256.0))
    # max radius grew from 0.5 to up to 3 -> cell size scales by 2.2*max_r
    assert eng.cell_size() == 2.2 * float(eng.state.max_radius)
    assert eng.cell_size() > cs0


def test_spawn_respects_capacity():
    eng = Engine(_cfg(max_particles=150), seed=3)
    eng.spawn_at((256.0, 256.0))  # 100 + 100 > 150: burst refused
    assert eng.num_particles() == 100


def test_simulation_continues_after_spawn():
    eng = Engine(_cfg(), seed=4)
    eng.run(5)
    eng.spawn_at((256.0, 256.0))
    st = eng.run(5)
    assert np.isfinite(np.asarray(st.x)).all()
    assert eng.num_particles() == 200
