"""Broad-phase grid tests, mirroring the reference's tests/grid.rs strategy:
hand-placed particles -> golden H/P cell ids -> sorted pair map."""

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig, UNUSED_CELL_ID
from gpu_physics_engine_tpu.ops import grid
import reference_model as ref
import pytest

pytestmark = pytest.mark.quick

CELL = 2.2  # cell size for radius-1 particles


def _candidates(positions, radii, cell_size=CELL, cap=None):
    positions = np.asarray(positions, np.float32)
    radii = np.asarray(radii, np.float32)
    n = len(radii)
    cap = cap or n
    x = jnp.zeros(cap, jnp.float32).at[:n].set(positions[:, 0])
    y = jnp.zeros(cap, jnp.float32).at[:n].set(positions[:, 1])
    r = jnp.zeros(cap, jnp.float32).at[:n].set(radii)
    active = jnp.arange(cap) < n
    return grid.build_candidates(x, y, r, active, jnp.float32(cell_size))


def test_center_of_cell_has_no_phantoms():
    # A small particle centered in a cell touches only its home cell.
    cand = _candidates([[CELL * 1.5, CELL * 1.5]], [0.5])
    cells = np.asarray(cand.cells[0])
    assert cells[0] == ref.morton_encode(1, 1)
    assert (cells[1:] == UNUSED_CELL_ID).all()


def test_corner_particle_has_three_phantoms():
    # A particle near a cell corner overlaps the 3 adjacent neighbors.
    eps = 0.05
    cand = _candidates([[CELL * 2 + eps, CELL * 2 + eps]], [1.0])
    cells = np.asarray(cand.cells[0])
    assert cells[0] == ref.morton_encode(2, 2)
    # phantom scan order y=-1..1, x=-1..1: (1,1), (2,1), (1,2)
    assert cells[1] == ref.morton_encode(1, 1)
    assert cells[2] == ref.morton_encode(2, 1)
    assert cells[3] == ref.morton_encode(1, 2)


def test_cell_ids_match_golden_model():
    rng = np.random.default_rng(7)
    n = 64
    positions = rng.uniform(2.0, 40.0, size=(n, 2)).astype(np.float32)
    radii = rng.uniform(0.5, 1.0, size=n).astype(np.float32)

    cand = _candidates(positions, radii)
    cell_ids, object_ids = grid.build_cell_ids(cand)

    want_cells, want_objs = ref.build_cell_ids(positions, radii, CELL)
    np.testing.assert_array_equal(
        np.asarray(cell_ids).astype(np.uint64), want_cells)
    # object ids only meaningful at used slots
    used = want_cells != ref.UNUSED
    np.testing.assert_array_equal(np.asarray(object_ids)[used], want_objs[used])


def test_sort_map_matches_golden_model():
    rng = np.random.default_rng(8)
    n = 128
    positions = rng.uniform(2.0, 60.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 1.0, np.float32)

    cand = _candidates(positions, radii)
    sc, so = grid.sort_map(*grid.build_cell_ids(cand))

    wc, wo = ref.sort_map(*ref.build_cell_ids(positions, radii, CELL))
    np.testing.assert_array_equal(np.asarray(sc).astype(np.uint64), wc)
    used = wc != ref.UNUSED
    np.testing.assert_array_equal(np.asarray(so)[used], wo[used])
    # UNUSED padding sank to the end
    first_unused = int(used.sum())
    assert (np.asarray(sc)[first_unused:] == UNUSED_CELL_ID).all()


def test_buckets_contain_same_occupants_as_sorted_runs():
    rng = np.random.default_rng(9)
    n = 96
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=64.0, world_height=64.0,
                    initial_radius=1.0, max_occupancy=8)
    positions = rng.uniform(2.0, 60.0, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 1.0, np.float32)
    cand = _candidates(positions, radii, cell_size=CELL, cap=cfg.capacity)
    buckets = grid.build_buckets(cand, cfg)
    assert int(buckets.overflow) == 0

    obj, valid = buckets.occupants()
    obj, valid = np.asarray(obj), np.asarray(valid)
    nx, _ = cfg.grid_dims
    got = {}
    for cell_idx in np.nonzero(valid.any(-1))[0]:
        cx, cy = int(cell_idx % nx) - 1, int(cell_idx // nx) - 1  # -1 border
        occupants = obj[cell_idx][valid[cell_idx]].tolist()
        assert occupants == sorted(occupants)  # ascending object id
        got[(cx, cy)] = occupants

    wc, wo = ref.sort_map(*ref.build_cell_ids(positions, radii, CELL))
    want = {}
    for i, c in enumerate(wc):
        if c == ref.UNUSED:
            continue
        want.setdefault(ref.morton_decode(int(c)), []).append(int(wo[i]))
    assert got == want
