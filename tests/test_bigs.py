"""Big-particle overlay (ops/bigs.py): spawn routing, coupling physics,
capacity accounting, rendering — the heterogeneous-radius answer that
keeps production tile geometry fixed (vs the reference's grid rebuild,
grid.rs:265-291)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
from gpu_physics_engine_tpu.ops import bigs as bigs_ops
from gpu_physics_engine_tpu.ops import tiled


def _cfg(**kw):
    base = dict(max_particles=512, initial_particles=64,
                world_width=64.0, world_height=64.0,
                initial_radius=0.5, sort_interval_steps=0,
                tile_cap=8, mover_capacity=1024)
    base.update(kw)
    return SimConfig(**base)


def test_spawn_overlay_keeps_geometry():
    """Default tiled_spawn: a radius-3 burst must NOT re-tile — smalls
    keep their geometry, oversized spawns land in the overlay."""
    eng = TiledEngine(_cfg(), seed=5)
    t0 = eng.cell_size()
    assert eng.config.tile_max_radius_effective == 0.5
    eng.spawn_at((32.0, 32.0), count=30, verbose=False)
    assert eng.cell_size() == t0                       # geometry unchanged
    assert eng.config.tile_max_radius_effective == 0.5
    assert eng.num_particles() == 94
    assert eng.big is not None and int(eng.big.num_active) == 30
    # spawned radii span the reference range (1..3 integers)
    brad = np.asarray(eng.big.radius)[np.asarray(eng.big.pid) >= 0]
    assert brad.min() >= 1.0 and brad.max() >= 2.0
    # merged export: every pid exactly once, ascending
    pid, pos, prev, rad = eng._export()
    np.testing.assert_array_equal(pid, np.arange(94))
    assert rad.max() >= 2.0
    eng.run(20)
    assert eng.num_particles() == 94
    assert np.isfinite(eng.positions()).all()


def test_big_small_coupling_separates_overlap():
    """A big overlapping a small pushes it away (inverse-mass split:
    the small takes most of the correction)."""
    cfg = _cfg(initial_particles=1)
    eng = TiledEngine.from_arrays(
        cfg, np.array([[32.0, 32.0]], np.float32),
        np.array([0.5], np.float32))
    eng._insert_bigs(np.array([[33.0, 32.0]], np.float32),
                     np.array([2.0], np.float32),
                     np.array([100], np.int32))
    d0 = 1.0
    for _ in range(30):
        eng.step()
    pid, pos, _, _ = eng._export()
    d1 = abs(pos[pid == 100][0, 0] - pos[pid == 0][0, 0])
    assert d1 > d0  # separating
    assert np.isfinite(pos).all()
    # small moved farther than the big (w_small = r_big/(r_big+r_small))
    assert abs(pos[pid == 0][0, 0] - 32.0) > abs(pos[pid == 100][0, 0] - 33.0)


def test_big_big_coupling_separates_overlap():
    eng = TiledEngine(_cfg(initial_particles=2), seed=0)
    eng._insert_bigs(np.array([[30.0, 32.0], [32.0, 32.0]], np.float32),
                     np.array([2.0, 2.0], np.float32),
                     np.array([50, 51], np.int32))
    for _ in range(40):
        eng.step()
    pid, pos, _, _ = eng._export()
    d = np.linalg.norm(pos[pid == 50][0] - pos[pid == 51][0])
    assert d > 2.0  # was 2.0 apart at rsum 4.0: must push out
    assert np.isfinite(pos).all()


def test_overlay_capacity_overflow_counts():
    eng = TiledEngine(_cfg(big_capacity=4), seed=3)
    of0 = int(eng.state.overflow_count)
    eng.spawn_at((32.0, 32.0), count=10, verbose=False)
    assert int(eng.big.num_active) == 4
    assert int(eng.state.overflow_count) == of0 + 6  # refused inserts
    assert eng.num_particles() == 64 + 4


def test_overlay_renders_bigs():
    eng = TiledEngine(_cfg(initial_particles=1), seed=1)
    eng._insert_bigs(np.array([[32.0, 32.0]], np.float32),
                     np.array([3.0], np.float32),
                     np.array([7], np.int32))
    frame = eng.render_frame(width=160, height=96)
    assert frame.shape == (96, 160, 3) and frame.dtype == np.uint8
    # the radius-3 big at world center must light the frame center
    assert frame[40:56, 72:88].max() > 0


def test_window_halfwidth_covers_reach():
    cfg = _cfg()
    t, TY, TX = tiled.tile_geometry(cfg)
    W = bigs_ops.window_halfwidth(cfg)
    reach = (cfg.spawn_radius_max + cfg.tile_max_radius_effective
             + cfg.hysteresis_delta)
    assert W * t >= reach or W == (min(TY, TX) - 1) // 2


def test_couple_bigs_noop_without_contact():
    """No overlaps -> bit-identical state (pure Jacobi zero-correction)."""
    cfg = _cfg(initial_particles=8)
    eng = TiledEngine(cfg, seed=2)
    big = bigs_ops.init_bigs(16)
    big = dataclasses.replace(
        big, x=big.x.at[0].set(5.0), y=big.y.at[0].set(5.0),
        px=big.px.at[0].set(5.0), py=big.py.at[0].set(5.0),
        radius=big.radius.at[0].set(2.0), pid=big.pid.at[0].set(99),
        num_active=jnp.int32(1))
    # place the big far from every small
    tiles2, big2 = bigs_ops.couple_bigs(eng.state, big, cfg)
    np.testing.assert_array_equal(np.asarray(tiles2.x), np.asarray(eng.state.x))
    np.testing.assert_array_equal(np.asarray(big2.x), np.asarray(big.x))


def test_overlay_respects_relocate_interval():
    """tiled_relocate_interval with an active overlay: off-steps skip the
    tile relocate (hybrid_step_fn forwards do_relocate), every particle
    survives, physics stays finite, and the coupling window reach covers
    the interval's extra drift reserve."""
    kw = dict(tiled_relocate="pallas", tiled_match="flip",
              gravity=(0.0, -30.0), tiled_relocate_interval=2)
    eng = TiledEngine(_cfg(**kw), seed=5, chunk=8)
    eng.spawn_at((32.0, 32.0), count=10, verbose=False)
    assert eng.big is not None
    n0 = eng.num_particles()
    eng.run(12)          # one full chunk + a 4-step remainder window
    eng.step()           # on-phase single step (steps_done 12, even)
    eng.step()           # off-phase single step (steps_done 13, odd)
    assert eng.num_particles() == n0
    assert np.isfinite(eng.positions()).all()
    cfg = eng.config
    t, TY, TX = tiled.tile_geometry(cfg)
    W = bigs_ops.window_halfwidth(cfg)
    reach = (cfg.spawn_radius_max + cfg.tile_max_radius_effective
             + cfg.hysteresis_delta
             + (cfg.tiled_relocate_interval - 1) * cfg.drift_budget)
    assert W * t >= reach or W == (min(TY, TX) - 1) // 2


def test_checkpoint_roundtrip_preserves_overlay(tmp_path):
    """save_checkpoint must carry the big-particle overlay (oversized
    spawns do not live in the tiles) and from_checkpoint must restore
    it with velocity (previous positions) intact."""
    eng = TiledEngine(_cfg(), seed=5)
    eng.spawn_at((32.0, 32.0), count=30, verbose=False)
    eng.run(5)
    n = eng.num_particles()
    bpid0, bpos0, bprev0, brad0 = bigs_ops.export_bigs(eng.big)
    path = str(tmp_path / "bigs.npz")
    eng.save_checkpoint(path)

    eng2 = TiledEngine.from_checkpoint(path, seed=0)
    assert eng2.num_particles() == n
    assert eng2.big is not None
    bpid1, bpos1, bprev1, brad1 = bigs_ops.export_bigs(eng2.big)
    np.testing.assert_array_equal(bpid1, bpid0)
    np.testing.assert_array_equal(bpos1, bpos0)
    np.testing.assert_array_equal(bprev1, bprev0)   # velocity preserved
    np.testing.assert_array_equal(brad1, brad0)
    # resumed engine keeps running the hybrid step
    eng2.run(3)
    assert eng2.num_particles() == n
    # new spawns must not collide with restored pids
    assert eng2._next_pid > int(bpid0.max())

    # the sharded engine has no overlay: must refuse, not silently drop
    import pytest
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)
    with pytest.raises(ValueError, match="overlay"):
        ShardedTiledEngine.from_checkpoint(path)
