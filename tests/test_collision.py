"""Collision-cell extraction + solver tests.

Mirrors the reference's tests/grid.rs collision-cell cases (including the
546-duplicate-particle case, tests/grid.rs:255-292) and golden-checks the
4-color Gauss-Seidel solve against the scalar numpy model."""

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig, UNUSED_CELL_ID
from gpu_physics_engine_tpu.ops import collision, grid
import reference_model as ref
import pytest

pytestmark = pytest.mark.quick

CELL = 2.2


def _arrays(positions, radii, cap=None):
    positions = np.asarray(positions, np.float32)
    radii = np.asarray(radii, np.float32)
    n = len(radii)
    cap = cap or n
    x = jnp.zeros(cap, jnp.float32).at[:n].set(positions[:, 0])
    y = jnp.zeros(cap, jnp.float32).at[:n].set(positions[:, 1])
    r = jnp.zeros(cap, jnp.float32).at[:n].set(radii)
    active = jnp.arange(cap) < n
    return x, y, r, active


def _sorted_pairs(x, y, r, active, cell_size=CELL):
    cand = grid.build_candidates(x, y, r, active, jnp.float32(cell_size))
    return grid.sort_map(*grid.build_cell_ids(cand))


def test_no_collision_cells_when_spread_out():
    # tests/grid.rs:203-226: no cell with 2+ occupants -> empty list.
    positions = [[CELL * (2 * i + 0.5), CELL * 0.5] for i in range(4)]
    x, y, r, active = _arrays(positions, [0.5] * 4)
    sc, _ = _sorted_pairs(x, y, r, active)
    cells, total = collision.build_collision_cells(sc)
    assert int(total) == 0
    assert (np.asarray(cells) == UNUSED_CELL_ID).all()


def test_546_duplicates_collision_cells():
    # tests/grid.rs:255-292: 546 identical particles at one position produce
    # 4 collision cells (H + 3 P) with starts [0, 546, 1092, 1638].
    n = 546
    pos = [[CELL + 0.05, CELL + 0.05]] * n  # near a corner -> 3 phantoms
    x, y, r, active = _arrays(pos, [1.0] * n)
    sc, _ = _sorted_pairs(x, y, r, active)
    cells, total = collision.build_collision_cells(sc)
    assert int(total) == 4
    got = np.asarray(cells)[:4].tolist()
    assert got == [0, 546, 1092, 1638]
    assert (np.asarray(cells)[4:] == UNUSED_CELL_ID).all()


def test_collision_cells_match_golden_model():
    rng = np.random.default_rng(3)
    n = 80
    positions = rng.uniform(2.0, 30.0, size=(n, 2)).astype(np.float32)
    x, y, r, active = _arrays(positions, [1.0] * n)
    sc, _ = _sorted_pairs(x, y, r, active)
    cells, total = collision.build_collision_cells(sc)
    want = ref.collision_cells(
        ref.sort_map(*ref.build_cell_ids(positions, np.ones(n), CELL))[0])
    assert int(total) == len(want)
    np.testing.assert_array_equal(np.asarray(cells)[:len(want)], want)


def test_two_particle_overlap_resolution():
    # Two radius-0.5 particles 0.8 apart in the middle of one cell (no
    # phantom co-occupancy): penetration 0.2, correction 0.2*0.6 = 0.12,
    # split evenly (equal radii) -> each moves 0.06 along the axis.
    positions = [[CELL / 2 - 0.4, CELL / 2], [CELL / 2 + 0.4, CELL / 2]]
    x, y, r, active = _arrays(positions, [0.5, 0.5])
    sc, so = _sorted_pairs(x, y, r, active)
    table = collision.occupants_from_sorted(sc, so, K=8)
    nx_, ny_ = collision.solve_colored(x, y, r, table, jnp.float32(0.6))
    got = np.stack([np.asarray(nx_), np.asarray(ny_)], -1)
    np.testing.assert_allclose(got[0], [CELL / 2 - 0.46, CELL / 2], rtol=1e-6)
    np.testing.assert_allclose(got[1], [CELL / 2 + 0.46, CELL / 2], rtol=1e-6)


def test_colored_solve_matches_golden_model():
    rng = np.random.default_rng(4)
    n = 60
    positions = rng.uniform(3.0, 25.0, size=(n, 2)).astype(np.float32)
    radii = rng.uniform(0.6, 1.0, size=n).astype(np.float32)
    x, y, r, active = _arrays(positions, radii)
    sc, so = _sorted_pairs(x, y, r, active)
    K = 16
    table = collision.occupants_from_sorted(sc, so, K=K)
    nx_, ny_ = collision.solve_colored(x, y, r, table, jnp.float32(0.6))
    got = np.stack([np.asarray(nx_)[:n], np.asarray(ny_)[:n]], -1)

    wc, wo = ref.sort_map(*ref.build_cell_ids(positions, radii, CELL))
    want = ref.solve_colored(positions, radii, wc, wo, 0.6, max_occupancy=K)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bucket_and_sorted_colored_solves_agree():
    rng = np.random.default_rng(5)
    n = 64
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=32.0, world_height=32.0,
                    initial_radius=1.0, max_occupancy=12)
    positions = rng.uniform(3.0, 29.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 1.0, np.float32)
    x, y, r, active = _arrays(positions, radii, cap=cfg.capacity)

    sc, so = _sorted_pairs(x, y, r, active)
    t1 = collision.occupants_from_sorted(sc, so, K=cfg.max_occupancy)
    x1, y1 = collision.solve_colored(x, y, r, t1, jnp.float32(0.6))

    cand = grid.build_candidates(x, y, r, active, jnp.float32(CELL))
    buckets = grid.build_buckets(cand, cfg)
    t2 = collision.occupants_from_buckets(buckets, cfg)
    x2, y2 = collision.solve_colored(x, y, r, t2, jnp.float32(0.6))

    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_occupancy_overflow_detected():
    n = 20  # 20 co-located particles >> K=8
    pos = [[3.0, 3.0]] * n
    x, y, r, active = _arrays(pos, [1.0] * n)
    sc, so = _sorted_pairs(x, y, r, active)
    table = collision.occupants_from_sorted(sc, so, K=8)
    assert int(table.overflow) > 0


def test_jacobi_reduces_overlap():
    rng = np.random.default_rng(6)
    n = 40
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=32.0, world_height=32.0,
                    initial_radius=1.0, max_occupancy=12, solver="jacobi")
    positions = rng.uniform(4.0, 28.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 1.0, np.float32)
    x, y, r, active = _arrays(positions, radii, cap=cfg.capacity)

    def total_overlap(px_, py_):
        p = np.stack([px_, py_], -1)[:n]
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        pen = np.maximum(2.0 - d, 0.0)
        return np.triu(pen, 1).sum()

    before = total_overlap(np.asarray(x), np.asarray(y))
    cand = grid.build_candidates(x, y, r, active, jnp.float32(CELL))
    hb = grid.build_buckets(cand, cfg, home_only=True)
    nx_, ny_ = collision.solve_jacobi(x, y, r, hb, cand, cfg, active)
    after = total_overlap(np.asarray(nx_), np.asarray(ny_))
    assert after < before


def test_engine_debug_downloads():
    """Engine debug accessors mirror the reference's test downloads
    (Grid::cell_ids/object_ids, CollisionSystem::download_collision_cells)."""
    from gpu_physics_engine_tpu import Engine, SimConfig
    cfg = SimConfig(max_particles=546, initial_particles=546,
                    world_width=32.0, world_height=32.0, initial_radius=1.0)
    pos = np.tile(np.array([[CELL + 0.05, CELL + 0.05]], np.float32), (546, 1))
    eng = Engine.from_arrays(cfg, pos, np.ones(546, np.float32))
    sc, so = eng.debug_grid()
    assert sc.shape[0] == 4 * cfg.capacity
    cells, total = eng.debug_collision_cells()
    assert total == 4
    assert cells[:4].tolist() == [0, 546, 1092, 1638]
