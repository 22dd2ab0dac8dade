"""Multi-chip sharded step tests on a virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_physics_engine_tpu import SimConfig, StepParams
from gpu_physics_engine_tpu.core import state as sl
from gpu_physics_engine_tpu.core.stepper import make_step
from gpu_physics_engine_tpu.parallel import halo, mesh as mesh_lib


def _cfg(**kw):
    base = dict(max_particles=256, initial_particles=256,
                world_width=128.0, world_height=32.0,
                initial_radius=0.5, sort_interval_steps=0,
                halo_capacity=64, migration_capacity=32)
    base.update(kw)
    return SimConfig(**base)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return mesh_lib.make_mesh(8)


def test_mesh_has_8_devices(mesh8):
    assert mesh8.devices.size == 8


def test_sharded_matches_single_chip_dilute(mesh8):
    """Collision-free scene: sharded trajectories == single-chip (exactly
    the same Verlet math, no cross-boundary coupling)."""
    cfg = _cfg()
    rng = np.random.default_rng(0)
    n = 64
    positions = rng.uniform(4.0, 124.0, size=(n, 2)).astype(np.float32)
    positions[:, 1] = rng.uniform(4.0, 28.0, size=n)
    radii = np.full(n, 0.5, np.float32)

    # single chip
    st = sl.from_arrays(cfg, positions, radii)
    step = make_step(cfg)
    params = StepParams.make(cfg.dt)
    for _ in range(5):
        st = step(st, params)
    single = np.sort(
        np.stack([np.asarray(st.x)[:n], np.asarray(st.y)[:n]], -1), axis=0)

    # sharded
    sst = halo.init_sharded(cfg, mesh8, positions, radii, slots_per_shard=64)
    sstep = halo.make_sharded_step(cfg, mesh8)
    for _ in range(5):
        sst = sstep(sst, params)
    pos, _ = halo.gather_alive(sst)
    assert pos.shape[0] == n  # nobody lost
    sharded = np.sort(pos, axis=0)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_migration_across_slabs(mesh8):
    """A particle pushed across a slab boundary migrates to the neighbor."""
    cfg = _cfg(gravity=(200.0, 0.0))  # accelerate +x
    # one particle just left of the slab-1 boundary (slab width 16)
    positions = np.array([[15.5, 16.0]], np.float32)
    radii = np.array([0.5], np.float32)
    sst = halo.init_sharded(cfg, mesh8, positions, radii, slots_per_shard=16)
    sstep = halo.make_sharded_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)

    def owner_of_particle(s):
        alive = np.asarray(s.alive)
        (idx,) = np.nonzero(alive)
        assert len(idx) == 1
        return int(idx[0]) // 16

    assert owner_of_particle(sst) == 0
    for _ in range(30):
        sst = sstep(sst, params)
    pos, _ = halo.gather_alive(sst)
    assert pos[0, 0] > 16.0
    assert owner_of_particle(sst) >= 1
    assert int(np.asarray(sst.dropped).sum()) == 0


def test_cross_boundary_collision_resolved(mesh8):
    """Two overlapping particles on opposite sides of a slab edge get pushed
    apart — the pair is only visible via halo exchange."""
    cfg = _cfg()
    b = 16.0  # slab 0/1 boundary
    positions = np.array([[b - 0.4, 16.0], [b + 0.4, 16.0]], np.float32)
    radii = np.array([0.5, 0.5], np.float32)
    sst = halo.init_sharded(cfg, mesh8, positions, radii, slots_per_shard=16)
    sstep = halo.make_sharded_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    d0 = 0.8
    for _ in range(5):
        sst = sstep(sst, params)
    pos, _ = halo.gather_alive(sst)
    assert pos.shape[0] == 2
    d1 = abs(pos[0, 0] - pos[1, 0])
    assert d1 > d0  # separation grew
    # overlap (0.2) fully resolved: the pair must be at least in contact
    # (r1 + r2 = 1.0) — and the Verlet velocity the projection imparted
    # (~0.12/step) bounds the drift: 5 steps cannot exceed ~1.6
    assert 1.0 - 1e-5 <= d1 <= 1.6


def test_dense_sharded_scene_sane(mesh8):
    """A dense random scene across all slabs stays finite and loses nobody."""
    cfg = _cfg()
    rng = np.random.default_rng(1)
    n = 200
    positions = np.stack([
        rng.uniform(1.0, 127.0, n), rng.uniform(1.0, 31.0, n)], -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    sst = halo.init_sharded(cfg, mesh8, positions, radii, slots_per_shard=64)
    sstep = halo.make_sharded_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    for _ in range(20):
        sst = sstep(sst, params)
    pos, r = halo.gather_alive(sst)
    assert pos.shape[0] + int(np.asarray(sst.dropped).sum()) == n
    assert np.isfinite(pos).all()
    assert (pos[:, 0] >= 0.5 - 1e-5).all() and (pos[:, 0] <= 127.5 + 1e-5).all()


def test_sharded_resort_compacts_and_preserves(mesh8):
    """Per-shard Morton resort keeps everyone and compacts alive slots."""
    cfg = _cfg(sort_interval_steps=3)
    rng = np.random.default_rng(2)
    n = 120
    positions = np.stack([
        rng.uniform(1.0, 127.0, n), rng.uniform(1.0, 31.0, n)], -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    sst = halo.init_sharded(cfg, mesh8, positions, radii, slots_per_shard=64)
    sstep = halo.make_sharded_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    def is_prefix_compact(s):
        alive = np.asarray(s.alive).reshape(8, 64)
        return all(a[:np.nonzero(a)[0][-1] + 1].all()
                   for a in alive if a.any())

    # steps 7-9 of this seed have migration-punched holes (measured on the
    # deterministic CPU path); the step-10 resort must close them
    for _ in range(9):
        sst = sstep(sst, params)
    assert not is_prefix_compact(sst)  # holes exist before the resort
    sst = sstep(sst, params)
    pos, _ = halo.gather_alive(sst)
    assert pos.shape[0] + int(np.asarray(sst.dropped).sum()) == n
    assert np.isfinite(pos).all()
    # the resort sank dead slots: alive is a prefix within each shard
    assert is_prefix_compact(sst)


# ---------------- sharded tiled pipeline ----------------

def _tcfg(**kw):
    base = dict(max_particles=512, initial_particles=256,
                world_width=64.0, world_height=64.0,
                initial_radius=0.5, sort_interval_steps=0,
                pipeline="tiled", tile_cap=12, migration_capacity=64,
                tiled_collide="jnp")
    base.update(kw)
    return SimConfig(**base)


def test_sharded_tiled_matches_single_chip(mesh8):
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    from gpu_physics_engine_tpu.parallel import tiled_shard

    cfg = _tcfg()
    rng = np.random.default_rng(0)
    n = 200
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)], -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    single = TiledEngine.from_arrays(cfg, positions, radii)
    sstate = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
    sstep = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)

    single.run(15)
    for _ in range(15):
        sstate = sstep(sstate, params)

    assert int(sstate.num_active) == n
    assert int(sstate.overflow_count) == 0
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    pid_s, pos_s, _, _ = export_particles(sstate)
    np.testing.assert_array_equal(pid_s, np.arange(n))
    np.testing.assert_allclose(pos_s, single.positions(), atol=1e-5)


def test_sharded_tiled_cross_slab_migration(mesh8):
    from gpu_physics_engine_tpu.parallel import tiled_shard
    from gpu_physics_engine_tpu.ops.tiled import export_particles

    cfg = _tcfg(initial_particles=1, max_particles=8,
                gravity=(0.0, 300.0))  # accelerate +y across row slabs
    positions = np.array([[32.0, 2.0]], np.float32)
    radii = np.array([0.5], np.float32)
    sstate = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
    sstep = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    for _ in range(40):
        sstate = sstep(sstate, params)
    assert int(sstate.num_active) == 1
    assert int(sstate.overflow_count) == 0
    _, pos, _, _ = export_particles(sstate)
    assert pos[0, 1] > 30.0  # crossed most of the world upward


def test_sharded_tiled_spawn(mesh8):
    from gpu_physics_engine_tpu.parallel import tiled_shard
    from gpu_physics_engine_tpu.ops.tiled import export_particles

    cfg = _tcfg(initial_particles=16, max_particles=128)
    rng = np.random.default_rng(4)
    positions = np.stack([
        rng.uniform(1.0, 63.0, 16), rng.uniform(1.0, 63.0, 16)], -1).astype(np.float32)
    radii = np.full(16, 0.5, np.float32)
    sstate = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
    insert = tiled_shard.make_sharded_insert(cfg, mesh8)
    # spawn 24 particles spread over the whole world (many slabs)
    spawn_pos = np.stack([
        rng.uniform(1.0, 63.0, 24), rng.uniform(1.0, 63.0, 24)], -1).astype(np.float32)
    sstate, placed = insert(sstate, jnp.asarray(spawn_pos),
                            jnp.full(24, 0.5, jnp.float32),
                            jnp.arange(16, 40, dtype=jnp.int32),
                            jnp.zeros(24, bool))
    assert bool(placed.all())
    sstate = dataclasses.replace(
        sstate, num_active=sstate.num_active + jnp.int32(24))
    assert int(sstate.num_active) == 40
    pid, pos, _, _ = export_particles(sstate)
    assert len(pid) == 40
    np.testing.assert_array_equal(np.sort(pid), np.arange(40))
    # spawned particles live where they were asked to
    np.testing.assert_allclose(pos[np.argsort(pid)][16:], spawn_pos, atol=1e-6)
    # and the sim keeps running
    sstep = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    for _ in range(5):
        sstate = sstep(sstate, params)
    assert int(sstate.num_active) == 40


def test_sharded_tiled_engine_facade(mesh8):
    from gpu_physics_engine_tpu.parallel.tiled_shard import ShardedTiledEngine

    cfg = _tcfg(initial_particles=100, max_particles=512,
                tile_max_radius=1.0, tile_cap=0)
    eng = ShardedTiledEngine(cfg, mesh=mesh8, seed=0)
    assert eng.config.tile_cap >= 8
    eng.run(5)
    eng.press_mouse((32.0, 32.0))
    eng.run(5)
    eng.spawn_at((32.0, 32.0), count=16, verbose=False)
    assert eng.num_particles() == 116 - int(np.asarray(eng.state.overflow_count))
    eng.run(5)
    p = eng.positions()
    assert np.isfinite(p).all()
    assert eng.velocities().shape == p.shape


def test_sharded_tiled_fused_pallas_matches_jnp(mesh8):
    """The fused Pallas substep inside shard_map (interpret mode on CPU)
    produces the same trajectories as the jnp slab path."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import tiled_shard

    rng = np.random.default_rng(4)
    n = 160
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)],
        -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    results = []
    for collide, fuse in (("jnp", False), ("pallas", True)):
        cfg = _tcfg(initial_particles=n, tiled_collide=collide,
                    tiled_fuse_integrate=fuse)
        st = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
        step = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
        params = StepParams.make(cfg.dt)
        for _ in range(8):
            st = step(st, params)
        pid, pos, prev, _ = export_particles(st)
        assert int(st.num_active) == n
        results.append((pid, pos, prev))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_allclose(results[1][1], results[0][1], atol=1e-5)
    np.testing.assert_allclose(results[1][2], results[0][2], atol=1e-5)


def test_sharded_checkpoint_cross_topology(mesh8, tmp_path):
    """A checkpoint saved on the 8-device sharded engine resumes on the
    single-chip TiledEngine AND on a fresh sharded engine, and all three
    continuations agree (the tiled checkpoint stores pid-ordered
    particle arrays, not the layout)."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    cfg = _tcfg(initial_particles=160, gravity=(0.0, -20.0))
    e1 = ShardedTiledEngine(cfg, mesh=mesh8, seed=0)
    e1.run(6)
    path = str(tmp_path / "sharded.npz")
    e1.save_checkpoint(path)

    e_single = TiledEngine.from_checkpoint(path)
    e_reshard = ShardedTiledEngine.from_checkpoint(path, mesh=mesh8)
    assert e_single.num_particles() == e1.num_particles()
    assert e_reshard.num_particles() == e1.num_particles()

    def fp(eng):
        eng.run(4)
        pid, pos, _, _ = export_particles(eng.state)
        return pos[np.argsort(pid)]

    a, b, c = fp(e1), fp(e_single), fp(e_reshard)
    np.testing.assert_allclose(b, a, atol=1e-5)
    np.testing.assert_allclose(c, a, atol=1e-5)


def test_sharded_tiled_uniform_radius_matches_general(mesh8):
    """tiled_uniform_radius inside shard_map: the radius-free sweep
    (fewer pallas inputs per slab) stays within ulp-scale of the
    radius-reading one and conserves particles."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import tiled_shard

    rng = np.random.default_rng(11)
    n = 160
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)],
        -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    results = []
    for uniform in (False, True):
        cfg = _tcfg(initial_particles=n, tiled_collide="pallas",
                    tiled_fuse_integrate=True,
                    tiled_uniform_radius=uniform)
        st = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
        step = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
        params = StepParams.make(cfg.dt)
        for _ in range(8):
            st = step(st, params)
        pid, pos, prev, _ = export_particles(st)
        assert int(st.num_active) == n
        order = np.argsort(pid)
        results.append((pid[order], pos[order], prev[order]))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_allclose(results[1][1], results[0][1], atol=1e-4)
    np.testing.assert_allclose(results[1][2], results[0][2], atol=1e-4)


def test_sharded_tiled_newton_matches_standard(mesh8):
    """tiled_newton inside shard_map: slab-boundary pairs are evaluated
    once per slab (each keeps the half landing on its own rows; the halo
    half is sliced away), so the Newton sweep must track the standard
    9-offset sweep to rounding and conserve particles."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import tiled_shard

    rng = np.random.default_rng(13)
    n = 160
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)],
        -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    results = []
    for newton in (False, True):
        cfg = _tcfg(initial_particles=n, tile_cap=4,
                    tiled_collide="pallas", tiled_fuse_integrate=True,
                    tiled_newton=newton)
        st = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
        step = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
        params = StepParams.make(cfg.dt)
        for _ in range(8):
            st = step(st, params)
        pid, pos, prev, _ = export_particles(st)
        assert int(st.num_active) == n
        order = np.argsort(pid)
        results.append((pid[order], pos[order], prev[order]))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_allclose(results[1][1], results[0][1], atol=1e-4)
    np.testing.assert_allclose(results[1][2], results[0][2], atol=1e-4)


def test_sharded_tiled_pull_relocate_matches_claim(mesh8):
    """The slab pull relocate (interpret-mode Pallas inside shard_map)
    conserves particles and matches the claim-relocate trajectories."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import tiled_shard

    rng = np.random.default_rng(9)
    n = 150
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)],
        -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    results = []
    for reloc in ("jnp", "pallas"):
        cfg = _tcfg(initial_particles=n, gravity=(0.0, -60.0),
                    tiled_relocate=reloc)
        st = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
        step = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
        params = StepParams.make(cfg.dt)
        for _ in range(12):
            st = step(st, params)
        pid, pos, prev, _ = export_particles(st)
        assert len(pid) == n, f"{reloc}: lost particles"
        results.append((pid, pos))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    # gravity pulls particles across slab boundaries; trajectories agree
    # (same pair sets; relocation never touches positions)
    np.testing.assert_allclose(results[1][1], results[0][1], atol=1e-5)


def test_sharded_tiled_all_pallas_paths(mesh8):
    """Fused collide+integrate AND pull relocate together inside shard_map
    (the real-TPU production multichip configuration, interpret mode)."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import tiled_shard

    rng = np.random.default_rng(11)
    n = 120
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)],
        -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    cfg = _tcfg(initial_particles=n, gravity=(0.0, -60.0),
                tiled_collide="pallas", tiled_fuse_integrate=True,
                tiled_relocate="pallas")
    st = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
    step = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    for _ in range(10):
        st = step(st, params)
    pid, pos, prev, _ = export_particles(st)
    assert len(pid) == n
    assert np.isfinite(pos).all()

    # reference: the all-jnp sharded path
    cfg2 = _tcfg(initial_particles=n, gravity=(0.0, -60.0))
    st2 = tiled_shard.init_sharded_tiles(cfg2, mesh8, positions, radii)
    step2 = tiled_shard.make_sharded_tiled_step(cfg2, mesh8)
    for _ in range(10):
        st2 = step2(st2, params)
    pid2, pos2, _, _ = export_particles(st2)
    np.testing.assert_array_equal(pid, pid2)
    np.testing.assert_allclose(pos, pos2, atol=1e-5)


def test_sharded_tiled_migration_overflow_never_duplicates(mesh8):
    """A migration buffer too small for the crossers defers them (counted)
    without ever duplicating or losing a particle — the pad-row planning
    hole found in review."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import tiled_shard

    rng = np.random.default_rng(13)
    n = 96
    # strong downward gravity drives many simultaneous slab crossings
    cfg = _tcfg(initial_particles=n, gravity=(0.0, -400.0),
                migration_capacity=1, tiled_relocate="pallas")
    positions = np.stack([
        rng.uniform(1.0, 63.0, n), rng.uniform(1.0, 63.0, n)],
        -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    st = tiled_shard.init_sharded_tiles(cfg, mesh8, positions, radii)
    step = tiled_shard.make_sharded_tiled_step(cfg, mesh8)
    params = StepParams.make(cfg.dt)
    for _ in range(15):
        st = step(st, params)
    pid, pos, prev, _ = export_particles(st)
    assert len(pid) == n                      # nothing lost
    assert len(np.unique(pid)) == n           # nothing duplicated
    assert np.isfinite(pos).all()


def test_sharded_tiled_relocate_interval(mesh8):
    """tiled_relocate_interval=2 on the sharded engine: off-steps skip
    relocation AND migration (storage-only phases), every particle
    survives, and trajectories track the every-step engine to float
    tolerance (same pair sets within the reserved staleness bound, only
    summation order may differ)."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    kw = dict(initial_particles=160, gravity=(0.0, -30.0),
              tiled_relocate="pallas", tiled_match="flip")
    e1 = ShardedTiledEngine(_tcfg(**kw), mesh=mesh8, seed=3)
    e2 = ShardedTiledEngine(_tcfg(tiled_relocate_interval=2, **kw),
                            mesh=mesh8, seed=3)
    e1.run(16)
    e2.run(16)
    p1, x1, _, _ = export_particles(e1.state)
    p2, x2, _, _ = export_particles(e2.state)
    assert len(p1) == len(p2) == 160
    np.testing.assert_array_equal(np.sort(p1), np.sort(p2))
    assert np.isfinite(x2).all()
    o1 = np.argsort(p1)
    o2 = np.argsort(p2)
    np.testing.assert_allclose(x1[o1], x2[o2], atol=2e-3)


def test_sharded_tiled_periodic_exact_sweep(mesh8):
    """TiledEngine parity: with the pallas pull relocate, the sharded
    engine runs the exact claim sweep at the sort cadence (the multi-hop
    staleness safety net).  The sweep moves storage, never positions —
    trajectories match a no-sweep run to float tolerance and everyone
    survives."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    kw = dict(initial_particles=160, gravity=(0.0, -30.0),
              tiled_relocate="pallas", tiled_match="flip")
    e1 = ShardedTiledEngine(_tcfg(sort_interval_steps=0, **kw),
                            mesh=mesh8, seed=3)
    e2 = ShardedTiledEngine(_tcfg(sort_interval_steps=4, **kw),
                            mesh=mesh8, seed=3)
    assert e1._sweep_interval == 240 and e1._sweep is not None
    assert e2._sweep_interval == 4
    e1.run(10)
    e2.run(10)  # sweeps fire at steps 4 and 8
    p1, x1, _, _ = export_particles(e1.state)
    p2, x2, _, _ = export_particles(e2.state)
    assert len(p1) == len(p2) == 160
    o1, o2 = np.argsort(p1), np.argsort(p2)
    np.testing.assert_allclose(x1[o1], x2[o2], atol=2e-3)
    assert np.isfinite(x2).all()


def test_sharded_tiled_step_honors_relocate_interval(mesh8):
    """Single-step driving (step(), not run()) must honor
    tiled_relocate_interval exactly like the scanned windows do: a
    step()-driven engine with iv=2 matches a run()-driven one bit for
    bit (same phase counter semantics)."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    kw = dict(initial_particles=160, gravity=(0.0, -30.0),
              tiled_relocate="pallas", tiled_match="flip",
              tiled_relocate_interval=2)
    e1 = ShardedTiledEngine(_tcfg(**kw), mesh=mesh8, seed=3)
    e2 = ShardedTiledEngine(_tcfg(**kw), mesh=mesh8, seed=3)
    e1.run(8)
    for _ in range(8):
        e2.step()
    p1, x1, v1, _ = export_particles(e1.state)
    p2, x2, v2, _ = export_particles(e2.state)
    assert len(p1) == len(p2) == 160
    o1, o2 = np.argsort(p1), np.argsort(p2)
    np.testing.assert_array_equal(p1[o1], p2[o2])
    np.testing.assert_array_equal(x1[o1], x2[o2])
    np.testing.assert_array_equal(v1[o1], v2[o2])


def test_sharded_tiled_spawn_disables_uniform_radius(mesh8):
    """Spawning mixed radii under tiled_uniform_radius=True must flip
    the engine to the general (radius-reading) sweep — the constant-rsum
    kernel would resolve the new pairs as if every radius were
    initial_radius."""
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    cfg = _tcfg(initial_particles=64, max_particles=512,
                tile_max_radius=1.0, tile_cap=0,
                tiled_uniform_radius=True)
    eng = ShardedTiledEngine(cfg, mesh=mesh8, seed=0)
    assert eng.config.tiled_uniform_radius
    eng.run(3)
    before = eng.num_particles()
    eng.spawn_at((32.0, 32.0), count=8, verbose=False)
    # ring_burst draws radii in [1, r_hi] != initial_radius 0.5
    assert not eng.config.tiled_uniform_radius
    eng.run(3)
    lost = int(np.asarray(eng.state.overflow_count))
    assert eng.num_particles() == before + 8 - lost


def test_sharded_rejects_rebuild_sweep(mesh8):
    """tiled_sweep='rebuild' is single-chip only (a global stable
    re-slot; slab-local would strand cross-slab movers) — the sharded
    engine must refuse LOUDLY, like the sharded-GS exclusion, not
    silently run the claim sweep instead."""
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    cfg = _tcfg(tiled_sweep="rebuild")
    with pytest.raises(ValueError, match="single-chip"):
        ShardedTiledEngine(cfg, mesh=mesh8, seed=0)


def test_sharded_insert_full_home_falls_back_across_slab(mesh8):
    """Round-4 fallback insert: a spawn whose full home tile sits at the
    TOP row of a slab must fall back into the next slab's bottom row
    without loss or duplication (the per-round psum sync in
    make_sharded_insert).  Found live by the dryrun spawn burn-in."""
    from gpu_physics_engine_tpu.parallel import tiled_shard
    from gpu_physics_engine_tpu.ops import tiled
    from gpu_physics_engine_tpu.ops.tiled import export_particles

    cfg = _tcfg(max_particles=256)
    t, TY, TX = tiled.tile_geometry(cfg)
    _, TYp, _, rows = tiled_shard.sharded_tile_geometry(cfg, 8)
    g = rows - 1          # top interior row of shard 0's slab
    assert g >= 2, "geometry must leave a full row below the boundary"
    home = (g, 5)
    cap = cfg.tile_cap
    # fill home, the row below, and both side tiles to cap: the only
    # free neighbor in INSERT_OFFSETS order is (g+1, 5) — shard 1
    block = [(g, 4), (g, 5), (g, 6), (g - 1, 4), (g - 1, 5), (g - 1, 6)]
    pos = []
    for (ty, tx) in block:
        for i in range(cap):
            fx = 0.15 + 0.7 * ((i * 5) % cap) / cap
            fy = 0.15 + 0.7 * i / cap
            pos.append(((tx - 1 + fx) * t, (ty - 1 + fy) * t))
    pos = np.asarray(pos, np.float32)
    n0 = len(pos)
    state = tiled_shard.init_sharded_tiles(
        cfg, mesh8, pos, np.full(n0, 0.5, np.float32))
    assert int(state.num_active) == n0
    insert = tiled_shard.make_sharded_insert(cfg, mesh8)
    spawn = np.asarray([((home[1] - 0.5) * t, (home[0] - 0.5) * t)],
                       np.float32).repeat(3, axis=0)
    spawn[:, 0] += np.asarray([-0.3, 0.0, 0.3], np.float32)
    state, placed = insert(state, jnp.asarray(spawn),
                           jnp.full(3, 0.5, jnp.float32),
                           jnp.arange(n0, n0 + 3, dtype=jnp.int32),
                           jnp.zeros(3, bool))
    assert bool(placed.all())                # nothing lost
    state = dataclasses.replace(
        state, num_active=state.num_active + jnp.int32(3))
    assert int(state.num_active) == n0 + 3
    assert int(state.overflow_count) == 0
    pid, p, _, _ = export_particles(state)
    np.testing.assert_array_equal(np.sort(pid), np.arange(n0 + 3))  # no dupes
    # the spawned three kept their positions and landed in shard 1's
    # bottom row (global row g+1 = rows)
    order = np.argsort(pid)
    np.testing.assert_allclose(p[order][n0:], spawn, atol=1e-6)
    where = np.argwhere(np.asarray(state.pid) >= n0)
    assert len(where) == 3
    for _, ty, tx in where:
        assert ty == g + 1 and tx == home[1]
