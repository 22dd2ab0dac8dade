"""Persistent tiled engine tests: golden pair math, relocation, spawn,
cross-pipeline agreement."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_physics_engine_tpu import Engine, SimConfig, StepParams
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.ops import tiled


def _cfg(**kw):
    base = dict(max_particles=512, initial_particles=256,
                world_width=64.0, world_height=64.0,
                initial_radius=0.5, sort_interval_steps=0,
                tile_cap=16, mover_capacity=1024)
    base.update(kw)
    return SimConfig(**base)


def test_init_export_roundtrip():
    rng = np.random.default_rng(0)
    n = 100
    positions = rng.uniform(1.0, 63.0, size=(n, 2)).astype(np.float32)
    radii = rng.uniform(0.3, 0.5, size=n).astype(np.float32)
    st = tiled.init_tiles(_cfg(), positions, radii)
    assert int(st.num_active) == n
    assert int(st.overflow_count) == 0
    pid, pos, prev, rad = tiled.export_particles(st)
    np.testing.assert_array_equal(pid, np.arange(n))
    np.testing.assert_allclose(pos, positions, rtol=1e-6)
    np.testing.assert_allclose(rad, radii, rtol=1e-6)


def test_single_pair_collision_matches_fast_solver_math():
    # two overlapping r=0.5 particles, 0.8 apart: each moves 0.06
    positions = np.array([[10.0 - 0.4, 10.0], [10.0 + 0.4, 10.0]], np.float32)
    radii = np.array([0.5, 0.5], np.float32)
    cfg = _cfg(initial_particles=2)
    st = tiled.init_tiles(cfg, positions, radii)
    st = tiled.collide(st, cfg)
    _, pos, _, _ = tiled.export_particles(st)
    np.testing.assert_allclose(pos[0], [10.0 - 0.46, 10.0], rtol=1e-5)
    np.testing.assert_allclose(pos[1], [10.0 + 0.46, 10.0], rtol=1e-5)


def test_pair_across_tile_boundary():
    cfg = _cfg(initial_particles=2)
    t, _, _ = tiled.tile_geometry(cfg)
    b = 2 * t  # a tile boundary
    positions = np.array([[b - 0.3, 10.0], [b + 0.3, 10.0]], np.float32)
    radii = np.array([0.5, 0.5], np.float32)
    st = tiled.init_tiles(cfg, positions, radii)
    st = tiled.collide(st, cfg)
    _, pos, _, _ = tiled.export_particles(st)
    assert pos[1, 0] - pos[0, 0] > 0.6  # pushed apart across the boundary


def test_relocation_moves_particle_between_tiles():
    cfg = _cfg(initial_particles=1)
    t, TY, TX = tiled.tile_geometry(cfg)
    positions = np.array([[0.5 * t, 0.5 * t]], np.float32)
    st = tiled.init_tiles(cfg, positions, np.array([0.5], np.float32))
    # teleport the particle two tiles right (simulating motion)
    st = tiled.TileState(
        x=st.x + jnp.where(st.pid >= 0, 2 * t, 0.0), y=st.y,
        px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)
    st2 = tiled.relocate(st, cfg)
    assert int(st2.overflow_count) == 0
    # it now lives in tile (1, 3): occupied slot's tx changed
    occ = np.asarray(st2.pid) >= 0
    k, ty, tx = np.nonzero(occ)
    assert len(k) == 1
    assert tx[0] == 3 and ty[0] == 1
    _, pos, _, _ = tiled.export_particles(st2)
    np.testing.assert_allclose(pos[0], [2.5 * t, 0.5 * t], rtol=1e-6)


def test_matches_fast_engine_in_dilute_scene():
    """Collision-free: tiled trajectories == array-engine trajectories."""
    cfg = _cfg(initial_particles=32, gravity=(3.0, -2.0))
    rng = np.random.default_rng(1)
    positions = rng.uniform(8.0, 56.0, size=(32, 2)).astype(np.float32)
    radii = np.full(32, 0.5, np.float32)

    e1 = Engine.from_arrays(cfg, positions, radii)
    e2 = TiledEngine.from_arrays(cfg, positions, radii)
    s1 = e1.run(20)
    e2.run(20)
    p1 = np.stack([np.asarray(s1.x)[:32], np.asarray(s1.y)[:32]], -1)
    p2 = e2.positions()
    np.testing.assert_allclose(p2, p1, atol=1e-5)


def test_dense_scene_overlap_decreases_and_everyone_survives():
    cfg = _cfg(initial_particles=256, substeps=2)
    eng = TiledEngine(cfg, seed=0)
    n0 = eng.num_particles()

    def total_pen(pos):
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        return np.triu(np.maximum(1.0 - d, 0.0), 1).sum()

    pen0 = total_pen(eng.positions())
    eng.run(40)
    assert eng.num_particles() == n0
    pos = eng.positions()
    assert np.isfinite(pos).all()
    assert total_pen(pos) < pen0
    r = eng.radii()
    assert (pos[:, 0] >= r - 1e-4).all()
    assert (pos[:, 0] <= 64.0 - r + 1e-4).all()


def test_spawn_and_attractor():
    # tiling sized for the spawn radius (spawned r <= min(3, tile_max_radius))
    cfg = _cfg(initial_particles=64, tile_max_radius=1.0)
    eng = TiledEngine(cfg, seed=2)
    eng.spawn_at((32.0, 32.0), count=20, verbose=False)
    assert eng.num_particles() == 84
    eng.press_mouse((32.0, 32.0))
    d0 = np.linalg.norm(eng.positions() - (32.0, 32.0), axis=-1).mean()
    eng.run(20)
    d1 = np.linalg.norm(eng.positions() - (32.0, 32.0), axis=-1).mean()
    assert d1 < d0
    assert eng.num_particles() == 84


def test_spawn_retiles_when_geometry_too_small():
    """tiled_spawn="retile": geometry sized for r=0.5 cannot hold a
    radius-3 spawn; spawn_at re-tiles (grid.rs:265-291 analog) instead of
    raising, preserving every pre-spawn particle's position and pid.
    (The default tiled_spawn routes oversized spawns to the ops/bigs.py
    overlay instead — see test_spawn_overlay_*.)"""
    cfg = _cfg(initial_particles=64, max_particles=256,
               tiled_spawn="retile")  # tile_max_radius=None
    eng = TiledEngine(cfg, seed=5)
    assert eng.config.tile_max_radius_effective == 0.5
    pid0, pos0, prev0, rad0 = tiled.export_particles(eng.state)
    eng.spawn_at((32.0, 32.0), count=30, verbose=False)
    # geometry grew to fit radius-3 spawns at reference cell sizing
    assert eng.config.tile_max_radius_effective == 3.0
    assert eng.cell_size() >= 2.0 * 3.0
    assert eng.num_particles() == 94
    pid1, pos1, prev1, rad1 = tiled.export_particles(eng.state)
    np.testing.assert_array_equal(pid1[:64], pid0)
    np.testing.assert_allclose(pos1[:64], pos0, rtol=1e-6)
    np.testing.assert_allclose(prev1[:64], prev0, rtol=1e-6)
    # spawned radii span the full reference range (1..3 integers)
    assert rad1[64:].max() >= 2.0
    eng.run(10)  # recompiled step works at the new geometry
    assert eng.num_particles() == 94
    assert np.isfinite(eng.positions()).all()


def test_explicit_tile_max_radius_still_caps_spawn():
    cfg = _cfg(initial_particles=32, max_particles=256, tile_max_radius=1.0)
    eng = TiledEngine(cfg, seed=2)
    eng.spawn_at((32.0, 32.0), count=10, verbose=False)
    assert eng.config.tile_max_radius_effective == 1.0  # no re-tile
    assert eng.radii().max() <= 1.0


def test_tiled_deterministic():
    cfg = _cfg(initial_particles=128)
    a = TiledEngine(cfg, seed=7); a.run(25)
    b = TiledEngine(cfg, seed=7); b.run(25)
    np.testing.assert_array_equal(np.asarray(a.state.x), np.asarray(b.state.x))
    np.testing.assert_array_equal(np.asarray(a.state.pid), np.asarray(b.state.pid))


def test_pallas_collide_matches_jnp():
    from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas
    rng = np.random.default_rng(3)
    n = 150
    cfg = _cfg(initial_particles=n, tile_cap=8)
    positions = rng.uniform(1.0, 63.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    st = tiled.init_tiles(cfg, positions, radii)
    a = tiled.collide(st, cfg)
    b = collide_pallas(st, cfg)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.y), np.asarray(b.y), atol=1e-6)


def test_oversized_radius_rejected():
    cfg = _cfg(initial_particles=1)
    with pytest.raises(ValueError, match="tile edge"):
        tiled.init_tiles(cfg, np.array([[10.0, 10.0]], np.float32),
                         np.array([5.0], np.float32))


def test_native_tiler_matches_numpy_fallback():
    rng = np.random.default_rng(5)
    n = 400
    cfg = _cfg(initial_particles=n, tile_cap=12)
    positions = rng.uniform(1.0, 63.0, size=(n, 2)).astype(np.float32)
    radii = rng.uniform(0.3, 0.5, size=n).astype(np.float32)
    a = tiled.init_tiles(cfg, positions, radii)
    saved = (tiled._TILER, tiled._TILER_FAILED)
    try:
        tiled._TILER, tiled._TILER_FAILED = None, True  # force numpy path
        b = tiled.init_tiles(cfg, positions, radii)
    finally:
        tiled._TILER, tiled._TILER_FAILED = saved
    np.testing.assert_array_equal(np.asarray(a.pid), np.asarray(b.pid))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.radius), np.asarray(b.radius))


def test_auto_tile_cap():
    cfg = _cfg(initial_particles=200, tile_cap=0)
    eng = TiledEngine(cfg, seed=0)
    assert eng.config.tile_cap >= 8
    assert eng.config.tile_cap % 4 == 0
    assert int(eng.state.overflow_count) == 0
    eng.run(5)
    assert eng.num_particles() == 200


# ---------------------------------------------------------------------------
# pull-based Pallas relocation (tiled_pallas.relocate_pallas)
# ---------------------------------------------------------------------------

def _teleport(st, dx=0.0, dy=0.0):
    """Shift live particles' positions (simulating motion since binning)."""
    live = st.pid >= 0
    return tiled.TileState(
        x=st.x + jnp.where(live, dx, 0.0), y=st.y + jnp.where(live, dy, 0.0),
        px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)


def test_pull_relocate_matches_claim_relocate_one_hop():
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    # exact-agreement test; cap 8 + flip keeps the interpret-mode kernel
    # compile tractable (matching mode is irrelevant to the assertion)
    cfg = _cfg(tiled_hysteresis=0.0, tile_cap=8, tiled_match="flip")
    t, TY, TX = tiled.tile_geometry(cfg)
    rng = np.random.default_rng(3)
    n = 64
    positions = rng.uniform(2.0, 62.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    st = tiled.init_tiles(cfg, positions, radii)
    # move everyone by up to one tile in a random direction
    st = _teleport(st, dx=float(0.7 * t), dy=float(-0.6 * t))

    a = tiled.relocate(st, cfg)          # claim-based
    b = relocate_pallas(st, cfg)         # pull-based
    assert int(a.overflow_count) == 0
    # flipped-slot contention may defer a few movers one pass; they must
    # all land within a couple of retries
    for _ in range(2):
        b = relocate_pallas(b, cfg)
    # same particles, same positions; only slot assignment may differ
    pa = tiled.export_particles(a)
    pb = tiled.export_particles(b)
    for xa, xb in zip(pa, pb):
        np.testing.assert_array_equal(xa, xb)
    # and every particle now lives in its home tile
    occ = np.asarray(b.pid) >= 0
    k, ty, tx = np.nonzero(occ)
    want_ty = (np.asarray(b.y)[occ] // t).astype(int) + 1
    want_tx = (np.asarray(b.x)[occ] // t).astype(int) + 1
    np.testing.assert_array_equal(ty, want_ty)
    np.testing.assert_array_equal(tx, want_tx)


def test_relocate_hysteresis_keeps_boundary_dancers_in_place():
    """A particle just past a tile boundary (within the hysteresis band)
    keeps its storage slot — boundary jitter must not generate mover
    traffic — while a deeper particle relocates.  Pair correctness for
    band particles is guaranteed by hysteresis_delta's safety bound."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    cfg = _cfg(initial_particles=2, tile_cap=4)
    t, TY, TX = tiled.tile_geometry(cfg)
    delta = cfg.hysteresis_delta
    assert 0.0 < delta <= (t - 2 * 0.5) / 2.0  # the provable-safe bound
    # both start mid-tile (2,2); one nudged just past the +x boundary,
    # one pushed a full tile
    pos = np.array([[1.5 * t, 1.5 * t], [1.5 * t, 2.5 * t]], np.float32)
    st = tiled.init_tiles(cfg, pos, np.full(2, 0.4, np.float32))
    st = tiled.TileState(
        x=st.x + jnp.where(st.pid == 0, 0.5 * t + 0.5 * delta,
                           jnp.where(st.pid == 1, t, 0.0)),
        y=st.y, px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)
    out = relocate_pallas(st, cfg)
    occ = np.asarray(out.pid) >= 0
    k, ty, tx = np.nonzero(occ)
    got = {int(np.asarray(out.pid)[a, b, c]): (int(b), int(c))
           for a, b, c in zip(k, ty, tx)}
    assert got[0] == (2, 2)   # dancer stayed (within the band)
    assert got[1] == (3, 3)   # deep mover relocated
    assert int(out.overflow_count) == 0


def test_pull_relocate_multi_hop_converges():
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    cfg = _cfg(initial_particles=1, tile_cap=8, tiled_match="flip")
    t, TY, TX = tiled.tile_geometry(cfg)
    st = tiled.init_tiles(cfg, np.array([[0.5 * t, 0.5 * t]], np.float32),
                          np.array([0.5], np.float32))
    st = _teleport(st, dx=float(3 * t))  # 3 tiles from home
    for hop in range(3):
        st = relocate_pallas(st, cfg)
    occ = np.asarray(st.pid) >= 0
    assert occ.sum() == 1                # never lost
    k, ty, tx = np.nonzero(occ)
    assert (ty[0], tx[0]) == (1, 4)      # home tile after 3 hops
    assert int(st.overflow_count) == 0   # each hop was granted


def test_pull_relocate_full_target_defers_and_retries():
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    cfg = _cfg(tile_cap=4, initial_particles=6, tiled_hysteresis=0.0)
    t, TY, TX = tiled.tile_geometry(cfg)
    # 4 particles fill tile (1,1); 2 in tile (1,2) want to move into (1,1)
    fill = [[0.2 * t + 0.1 * i, 0.5 * t] for i in range(4)]
    movers = [[1.2 * t, 0.3 * t], [1.4 * t, 0.6 * t]]
    pos = np.array(fill + movers, np.float32)
    st = tiled.init_tiles(cfg, pos, np.full(6, 0.01, np.float32))
    # movers teleported left one tile (their home becomes (1,1), full)
    live = st.pid >= 2  # only the two movers
    st = tiled.TileState(
        x=st.x - jnp.where((st.pid >= 4), t, 0.0), y=st.y,
        px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)
    st2 = relocate_pallas(st, cfg)
    occ = np.asarray(st2.pid) >= 0
    assert occ.sum() == 6                       # nothing lost
    assert int(st2.overflow_count) == 2         # both movers deferred
    # free the two slots the movers' flipped claims land on (slots 3 and 2
    # of the full tile) -> retry succeeds
    pid = np.asarray(st2.pid).copy()
    pid[(pid == 2) | (pid == 3)] = -1
    st3 = tiled.TileState(
        x=st2.x, y=st2.y, px=st2.px, py=st2.py, radius=st2.radius,
        pid=jnp.asarray(pid), num_active=jnp.int32(4),
        overflow_count=st2.overflow_count)
    st4 = relocate_pallas(st3, cfg)
    occ4 = np.asarray(st4.pid) >= 0
    k, ty, tx = np.nonzero(occ4)
    assert occ4.sum() == 4
    assert (tx == 1).all() and (ty == 1).all()  # everyone home in (1,1)
    assert int(st4.overflow_count) == 2         # no new deferrals


def test_tiled_step_with_pallas_relocate_conserves_particles():
    cfg = _cfg(initial_particles=128, tiled_collide="jnp",
               tiled_relocate="pallas")
    eng = TiledEngine(cfg, seed=0)
    eng.run(30)
    pid, pos, prev, rad = tiled.export_particles(eng.state)
    assert len(pid) == 128
    assert np.isfinite(pos).all()


def test_fused_collide_integrate_matches_separate():
    from gpu_physics_engine_tpu.ops.tiled_pallas import (
        collide_integrate_pallas, collide_pallas)
    cfg = _cfg(initial_particles=96, tile_cap=8)
    rng = np.random.default_rng(7)
    pos = rng.uniform(2.0, 62.0, size=(96, 2)).astype(np.float32)
    st = tiled.init_tiles(cfg, pos, np.full(96, 0.5, np.float32))
    params = StepParams.make(cfg.dt, mouse=(32.0, 32.0), pressed=True)

    a = tiled.integrate(collide_pallas(st, cfg), params, cfg)
    b = collide_integrate_pallas(st, params, cfg)
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.y), np.asarray(b.y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.px), np.asarray(b.px), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.py), np.asarray(b.py), atol=1e-6)


def test_init_spills_overflow_to_nearby_tiles():
    """A tile past capacity spills its extras to neighbors (both tiler
    paths, identical layout) instead of dropping them."""
    cfg = _cfg(tile_cap=2, initial_particles=5)
    t, TY, TX = tiled.tile_geometry(cfg)
    # 5 particles in tile (2, 2), cap 2 -> 3 spill into ring-1 neighbors
    pos = np.array([[1.5 * t + 0.05 * i, 1.5 * t] for i in range(5)],
                   np.float32)
    radii = np.full(5, 0.01, np.float32)
    a = tiled.init_tiles(cfg, pos, radii)
    saved = (tiled._TILER, tiled._TILER_FAILED)
    try:
        tiled._TILER, tiled._TILER_FAILED = None, True
        b = tiled.init_tiles(cfg, pos, radii)
    finally:
        tiled._TILER, tiled._TILER_FAILED = saved
    for st in (a, b):
        assert int(st.num_active) == 5
        assert int(st.overflow_count) == 0
        occ = np.asarray(st.pid) >= 0
        k, ty, tx = np.nonzero(occ)
        assert occ.sum() == 5
        # home tile holds cap, the rest sit within Chebyshev distance 1
        assert ((np.abs(ty - 2) <= 1) & (np.abs(tx - 2) <= 1)).all()
    np.testing.assert_array_equal(np.asarray(a.pid), np.asarray(b.pid))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    # spilled particles are movers: one relocate pass may return some home
    # as space allows; nothing is ever lost
    st2 = tiled.relocate(a, cfg)
    assert (np.asarray(st2.pid) >= 0).sum() == 5


def test_pull_relocate_deferral_settles_in_dense_scene():
    """The physics-quality signal: after the initial transient, the
    per-step deferral rate drops well below the early peak."""
    # tiled_match pinned to "flip": auto would pick greedy here, whose
    # 8*cap^2 unrolled matching (512 rounds at cap 8) inside the full
    # interpret-mode step costs ~45 min of CPU XLA compile on a small
    # box; the deferral-settling signal is matching-agnostic, and greedy
    # has its own (small-cap) tests below.
    cfg = _cfg(initial_particles=400, tile_cap=8, substeps=1,
               tiled_relocate="pallas", tiled_collide="jnp",
               tiled_match="flip")
    eng = TiledEngine(cfg, seed=5)
    deltas = []
    prev = int(eng.state.overflow_count)
    for _ in range(4):
        eng.run(5)
        cur = int(eng.state.overflow_count)
        deltas.append(cur - prev)
        prev = cur
    assert eng.num_particles() == 400
    assert deltas[-1] <= max(deltas[0], 10)  # no runaway growth


def test_greedy_matching_beats_flip_under_contention():
    """Two movers from different neighbors, both in slot 0, target the
    same empty tile: flip matching gives them ONE shared matching slot
    (cap-1), so one defers; greedy matches both to distinct free slots in
    a single pass.  This contention is why coarse-tile curve configs
    measured 2-10%/step deferral under flip."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    t = 2.2
    # movers in tiles (2,1) and (2,3), both homed to empty tile (2,2)
    pos = np.array([[0.5 * t, 1.5 * t], [2.5 * t, 1.5 * t]], np.float32)
    base = _cfg(tile_cap=4, initial_particles=2, tiled_hysteresis=0.0)
    st = tiled.init_tiles(base, pos, np.full(2, 0.01, np.float32))
    st = tiled.TileState(
        x=st.x + jnp.where(st.pid == 0, t, jnp.where(st.pid == 1, -t, 0.0)),
        y=st.y, px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)

    flip = relocate_pallas(st, base.replace(tiled_match="flip"))
    greedy = relocate_pallas(st, base.replace(tiled_match="greedy"))
    assert int(flip.overflow_count) == 1    # one mover lost the slot race
    assert int(greedy.overflow_count) == 0  # both placed
    occ = np.asarray(greedy.pid) >= 0
    k, ty, tx = np.nonzero(occ)
    assert occ.sum() == 2
    np.testing.assert_array_equal(ty, [2, 2])
    np.testing.assert_array_equal(tx, [2, 2])


def test_greedy_matching_with_occupied_target_slots():
    """Regression: occupied slots must not claim movers (their plan entry
    is masked off, so a claim by them starved the real free slots —
    70%/step deferral at high occupancy on hardware)."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    t = 2.2
    # tile (2,2) pre-filled with 2 residents; movers from (2,1) and (2,3)
    pos = np.array([[1.4 * t, 1.4 * t], [1.6 * t, 1.6 * t],
                    [0.5 * t, 1.5 * t], [2.5 * t, 1.5 * t]], np.float32)
    cfg = _cfg(tile_cap=4, initial_particles=4, tiled_match="greedy",
               tiled_hysteresis=0.0)
    st = tiled.init_tiles(cfg, pos, np.full(4, 0.01, np.float32))
    st = tiled.TileState(
        x=st.x + jnp.where(st.pid == 2, t,
                           jnp.where(st.pid == 3, -t, 0.0)),
        y=st.y, px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)
    out = relocate_pallas(st, cfg)
    assert int(out.overflow_count) == 0  # both movers placed
    occ = np.asarray(out.pid) >= 0
    k, ty, tx = np.nonzero(occ)
    assert occ.sum() == 4
    np.testing.assert_array_equal(sorted(ty), [2, 2, 2, 2])
    np.testing.assert_array_equal(sorted(tx), [2, 2, 2, 2])


def test_second_relocate_pass_takes_same_step_vacated_slots():
    """Leaver-blocked deferral: matching is one-shot within a pass, so an
    arrival cannot take a slot vacated by a mover LEAVING the same full
    tile this step (the plan sees pre-departure occupancy).  A second
    pass (tiled_relocate_passes=2) re-matches against post-departure
    occupancy and places it; only final-pass deferrals count."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    t = 2.2
    # 4 residents fill tile (2,2) at cap 4; one arrival waits in (2,1)
    pos = np.array([[1.2 * t, 1.5 * t], [1.4 * t, 1.5 * t],
                    [1.6 * t, 1.5 * t], [1.8 * t, 1.5 * t],
                    [0.5 * t, 1.5 * t]], np.float32)
    cfg = _cfg(tile_cap=4, initial_particles=5, tiled_match="greedy",
               tiled_hysteresis=0.0)
    st = tiled.init_tiles(cfg, pos, np.full(5, 0.01, np.float32))
    # residents all leave toward (2,3); the arrival homes to (2,2)
    st = tiled.TileState(
        x=st.x + jnp.where(st.pid >= 0, t, 0.0).astype(jnp.float32),
        y=st.y, px=st.px, py=st.py, radius=st.radius, pid=st.pid,
        num_active=st.num_active, overflow_count=st.overflow_count)

    one = tiled._relocate_passes(relocate_pallas, st, cfg)
    assert int(one.overflow_count) == 1  # arrival blocked by pre-departure
    two = tiled._relocate_passes(
        relocate_pallas, st, cfg.replace(tiled_relocate_passes=2))
    assert int(two.overflow_count) == 0
    occ = np.asarray(two.pid) >= 0
    k, ty, tx = np.nonzero(occ)
    got = {int(np.asarray(two.pid)[a, b, c]): (int(b), int(c))
           for a, b, c in zip(k, ty, tx)}
    assert got[4] == (2, 2)                    # arrival placed
    assert all(got[i] == (2, 3) for i in range(4))  # residents landed


def test_greedy_relocate_conserves_in_dense_scene():
    # cap 4 keeps the greedy unroll (8*cap^2 rounds) compile-friendly
    cfg = _cfg(initial_particles=200, tile_cap=4, tiled_collide="jnp",
               tiled_relocate="pallas", tiled_match="greedy")
    eng = TiledEngine(cfg, seed=9)
    eng.run(30)
    pid, pos, _, _ = tiled.export_particles(eng.state)
    assert len(pid) == 200
    assert np.isfinite(pos).all()


def test_single_kernel_relocate_matches_two_pass():
    """relocate_pallas_one (plan recomputed in-kernel) is bit-identical to
    the two-pass plan/apply relocate."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import (
        relocate_pallas, relocate_pallas_one)
    # the single-kernel variant implements flip matching only
    cfg = _cfg(tile_cap=8, tiled_match="flip", tiled_hysteresis=0.0)
    t, TY, TX = tiled.tile_geometry(cfg)
    rng = np.random.default_rng(17)
    n = 120
    positions = rng.uniform(2.0, 62.0, size=(n, 2)).astype(np.float32)
    st = tiled.init_tiles(cfg, positions, np.full(n, 0.5, np.float32))
    st = _teleport(st, dx=float(0.8 * t), dy=float(-1.4 * t))
    a = relocate_pallas(st, cfg)
    b = relocate_pallas_one(st, cfg)
    for name in ("x", "y", "px", "py", "radius", "pid"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)),
                                      err_msg=name)
    assert int(a.overflow_count) == int(b.overflow_count)


def test_relocate_interval_tracks_every_step_physics():
    """tiled_relocate_interval=2: relocation is skipped on off-steps, so
    storage goes (boundedly) stale, but positions stay physically
    equivalent to the every-step engine — relocation moves storage, not
    particles.  Trajectories only drift through summation-order changes
    in the sweep, so a moderate window must agree to float tolerance,
    conserve every particle, and stay finite."""
    kw = dict(initial_particles=220, tile_cap=8, tiled_collide="jnp",
              tiled_relocate="pallas", tiled_match="flip",
              gravity=(0.0, -30.0), sort_interval_steps=0)
    e1 = TiledEngine(_cfg(**kw), seed=3, chunk=8)
    e2 = TiledEngine(_cfg(tiled_relocate_interval=2, **kw), seed=3, chunk=8)
    e1.run(32)
    e2.run(32)
    p1, x1, _, _ = tiled.export_particles(e1.state)
    p2, x2, _, _ = tiled.export_particles(e2.state)
    assert len(p1) == len(p2) == 220
    np.testing.assert_array_equal(p1, p2)
    assert np.isfinite(x2).all()
    # same pair sets within the staleness bound -> same physics modulo
    # float summation order; positions must agree closely
    np.testing.assert_allclose(x1, x2, atol=2e-3)


def test_relocate_interval_reserves_hysteresis_margin():
    """The auto hysteresis shrinks by (interval-1)*drift_budget so the
    pair-set bound keeps holding; gs + interval>1 is rejected."""
    base = _cfg()
    iv2 = _cfg(tiled_relocate_interval=2)
    assert iv2.hysteresis_delta < base.hysteresis_delta
    t = base.tile_multiplier * base.tile_max_radius_effective
    r = base.tile_max_radius_effective
    assert (2.0 * (iv2.hysteresis_delta + iv2.drift_budget) + 2.0 * r
            <= t + 1e-6)
    with pytest.raises(AssertionError):
        _cfg(tiled_solver="gs", tiled_relocate_interval=2)


def test_relocate_interval_counter_never_exceeds_reserve():
    """Mixed step()/run() sequences must never stack more than
    (interval-1) consecutive un-relocated steps — the auto hysteresis
    only reserved that much drift.  (Regression: absolute-phase step()
    after a run() window, whose group pattern restarts at the window
    boundary, could stack up to 2*(interval-1).)"""
    kw = dict(initial_particles=64, tile_cap=8, tiled_collide="jnp",
              tiled_relocate="pallas", tiled_match="flip",
              tiled_relocate_interval=4)
    eng = TiledEngine(_cfg(**kw), seed=1, chunk=8)
    iv = eng._reloc_iv
    assert iv == 4

    def check():
        assert 0 <= eng._since_reloc <= iv - 1, eng._since_reloc

    eng.step(); check()          # first step relocates (counter forced)
    eng.step(); check()
    eng.run(8); check()          # full chunk window
    assert eng._since_reloc == (8 - 1) % iv   # window tail = 3 off-steps
    eng.step(); check()          # MUST relocate now (reserve spent)
    assert eng._since_reloc == 0
    eng.run(6)                   # CPU: falls to single steps
    check()
    eng.run(16); check()
    for _ in range(9):
        eng.step(); check()


def test_auto_cap_growth_on_deferral():
    """Runtime geometry adaptation (tiled_auto_cap_pct): a dense jam at
    a deliberately tiny cap must grow the slot capacity at run()
    boundaries until the deferred population can resolve, preserving
    every particle across re-tiles."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    cfg = SimConfig(max_particles=900, initial_particles=900,
                    world_width=24.0, world_height=12.0,
                    initial_radius=0.5, pipeline="tiled",
                    tile_multiplier=4.4, tile_cap=3,
                    sort_interval_steps=0, tiled_collide="jnp",
                    tiled_relocate="jnp", gravity=(0.0, -40.0),
                    tiled_auto_cap_pct=0.5)
    eng = TiledEngine(cfg, seed=0)
    n0 = eng.num_particles()
    cap0 = eng.config.tile_cap
    for _ in range(3):
        eng.run(8)
    assert eng.config.tile_cap > cap0
    assert eng.num_particles() == n0   # re-tiles never lose particles
    s = eng.state
    occ = np.asarray(s.pid) >= 0
    assert np.isfinite(np.asarray(s.x)[occ]).all()

    # knob off: cap must stay put on the same jam
    eng2 = TiledEngine(cfg.replace(tiled_auto_cap_pct=0.0), seed=0)
    eng2.run(8)
    assert eng2.config.tile_cap == cap0


def test_init_spills_widen_past_ring2():
    """A compressed scene (e.g. a gravity-packed checkpoint) can hold
    more particles near one tile than cap x the 5x5 neighborhood; the
    spill rings widen as far as the grid — conservation first, far
    spills are stale-but-recoverable (found live by the multichip
    dryrun's checkpoint/restore burn-in: a restore dropped 19)."""
    cfg = _cfg(tile_cap=2, initial_particles=0)
    t, TY, TX = tiled.tile_geometry(cfg)
    home = (4, 4)
    # fill the whole 5x5 block around home to cap...
    pos = []
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            for i in range(2):
                pos.append(((home[1] + dx - 1 + 0.3 + 0.4 * i) * t,
                            (home[0] + dy - 1 + 0.3 + 0.4 * i) * t))
    # + 3 extras in the home tile: must land at ring >= 3
    extras = 3
    for i in range(extras):
        pos.append(((home[1] - 1 + 0.45 + 0.02 * i) * t,
                    (home[0] - 1 + 0.55) * t))
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    radii = np.full(n, 0.01, np.float32)
    a = tiled.init_tiles(cfg, pos, radii)
    saved = (tiled._TILER, tiled._TILER_FAILED)
    try:
        tiled._TILER, tiled._TILER_FAILED = None, True
        b = tiled.init_tiles(cfg, pos, radii)
    finally:
        tiled._TILER, tiled._TILER_FAILED = saved
    for st in (a, b):
        assert int(st.num_active) == n
        assert int(st.overflow_count) == 0
        occ = np.asarray(st.pid) >= 0
        assert occ.sum() == n
        # the extras sit beyond the full 5x5 block
        k, ty, tx = np.nonzero(np.asarray(st.pid) >= n - extras)
        assert (np.maximum(np.abs(ty - home[0]),
                           np.abs(tx - home[1])) >= 3).all()
    np.testing.assert_array_equal(np.asarray(a.pid), np.asarray(b.pid))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
