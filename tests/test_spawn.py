"""Spawn-burst tests (reference add_particles path, particle_system.rs:163-220)."""

import numpy as np

from gpu_physics_engine_tpu import Engine, SimConfig
import pytest

pytestmark = pytest.mark.quick


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


# ---- tiled insert neighbor fallback (round-4): the reference never
# refuses a spawn (its arrays grow + the grid rebuilds, state.rs:187-200
# / grid.rs:265-291); a storage-full home tile therefore falls back to
# an adjacent tile (ops/tiled.INSERT_OFFSETS) — storage one tile off
# home is the deferred-mover invariant the 3x3 collide window and the
# pull relocate already honor.  Found live by the multichip dryrun's
# spawn burn-in (a burst clipped onto a gravity-packed floor lost one
# particle). ----

def _tiled_cfg(**kw):
    base = dict(max_particles=256, initial_particles=0,
                world_width=16.0, world_height=16.0,
                initial_radius=0.5, sort_interval_steps=0,
                pipeline="tiled", tile_cap=4, tiled_collide="jnp")
    base.update(kw)
    return SimConfig(**base)


def _fill_tiles(cfg, tile_list, per_tile):
    """positions filling each (ty, tx) interior tile with per_tile
    particles (spread inside the tile so they share it as home)."""
    import math as _m
    from gpu_physics_engine_tpu.ops import tiled
    t, _, _ = tiled.tile_geometry(cfg)
    pos = []
    for (ty, tx) in tile_list:
        for i in range(per_tile):
            fx = 0.2 + 0.6 * ((i * 7) % per_tile) / max(per_tile, 1)
            fy = 0.2 + 0.6 * i / max(per_tile, 1)
            pos.append(((tx - 1 + fx) * t, (ty - 1 + fy) * t))
    return np.asarray(pos, np.float32)


def test_tiled_insert_full_home_falls_back_to_neighbor():
    from gpu_physics_engine_tpu.ops import tiled

    cfg = _tiled_cfg()
    t, TY, TX = tiled.tile_geometry(cfg)
    home = (3, 3)
    fill = _fill_tiles(cfg, [home], 4)  # cap 4: home tile full
    state = tiled.init_tiles(cfg, fill, np.full(len(fill), 0.5, np.float32))
    assert int(state.num_active) == 4
    # three more into the SAME tile: home is full, neighbors are empty
    extra = _fill_tiles(cfg, [home], 3)
    state = tiled.insert_particles(
        state, cfg, extra, np.full(3, 0.5, np.float32),
        np.arange(4, 7, dtype=np.int32))
    assert int(state.num_active) == 7
    assert int(state.overflow_count) == 0
    pid, pos, _, _ = tiled.export_particles(state)
    np.testing.assert_array_equal(np.sort(pid), np.arange(7))
    # inserted particles kept their exact positions
    order = np.argsort(pid)
    np.testing.assert_allclose(pos[order][4:], extra, atol=1e-6)
    # and their storage is within one tile of home
    occ = np.argwhere(np.asarray(state.pid) >= 4)
    for _, ty, tx in occ:
        assert abs(ty - home[0]) <= 1 and abs(tx - home[1]) <= 1


def test_tiled_insert_full_3x3_refuses_loudly():
    from gpu_physics_engine_tpu.ops import tiled

    cfg = _tiled_cfg()
    home = (3, 3)
    block = [(home[0] + dy, home[1] + dx)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    fill = _fill_tiles(cfg, block, 4)  # all 9 tiles full
    state = tiled.init_tiles(cfg, fill, np.full(len(fill), 0.5, np.float32))
    n0 = int(state.num_active)
    extra = _fill_tiles(cfg, [home], 1)
    state = tiled.insert_particles(
        state, cfg, extra, np.full(1, 0.5, np.float32),
        np.asarray([9999], np.int32))
    assert int(state.num_active) == n0        # refused
    assert int(state.overflow_count) == 1     # ... and counted


def test_tiled_engine_far_spill_places_beyond_full_3x3():
    """Engine-level ladder: when the whole 3x3 around the spawn is
    storage-full, the host far-spill places at the nearest free tile
    (the reference never refuses a spawn); only a full GRID refuses."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    from gpu_physics_engine_tpu.ops import tiled

    cfg = _tiled_cfg(max_particles=64)
    home = (3, 3)
    block = [(home[0] + dy, home[1] + dx)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    fill = _fill_tiles(cfg, block, 4)
    state = tiled.init_tiles(cfg, fill, np.full(len(fill), 0.5, np.float32))
    eng = TiledEngine(cfg, seed=0, initial_state=state)
    n0 = eng.num_particles()
    extra = _fill_tiles(cfg, [home], 2)
    eng._next_pid = 1000
    eng._spawn_insert(np.asarray(extra),
                      np.full(2, 0.5, np.float32),
                      np.arange(1000, 1002, dtype=np.int32))
    assert eng.num_particles() == n0 + 2
    assert int(eng.state.overflow_count) == 0
    # placed at ring 2 (nearest free), positions preserved
    where = np.argwhere(np.asarray(eng.state.pid) >= 1000)
    assert len(where) == 2
    for _, ty, tx in where:
        assert max(abs(ty - home[0]), abs(tx - home[1])) == 2
