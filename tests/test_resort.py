"""Morton locality resort tests, mirroring tests/particle_sort.rs:44-71:
sorted home ids, expected permutation, rearranged SoA arrays."""

import numpy as np
import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig, UNUSED_CELL_ID
from gpu_physics_engine_tpu.core import state as sl
from gpu_physics_engine_tpu.ops import resort
import reference_model as ref


def test_three_particle_resort():
    # Like the reference case: particles whose home codes sort to a known
    # permutation.  cell_size = 2.2 (radius 1).
    cfg = SimConfig(max_particles=3, initial_particles=3,
                    world_width=32.0, world_height=32.0, initial_radius=1.0)
    cs = 2.2
    # home cells: (3,1)->morton 11, (0,0)->0, (1,1)->3
    positions = np.array([[3.5 * cs, 1.5 * cs],
                          [0.5 * cs, 0.5 * cs],
                          [1.5 * cs, 1.5 * cs]], np.float32)
    radii = np.ones(3, np.float32)
    st = sl.from_arrays(cfg, positions, radii)

    codes = resort.home_cell_codes(st.x, st.y, st.active_mask(), jnp.float32(cs))
    got_codes = np.asarray(codes)[:3]
    np.testing.assert_array_equal(
        got_codes, [ref.morton_encode(3, 1), 0, ref.morton_encode(1, 1)])

    new_st, perm = resort.morton_resort(st, jnp.float32(cs))
    # sorted order by code: particle 1 (0), particle 2 (3), particle 0 (11)
    np.testing.assert_array_equal(np.asarray(perm)[:3], [1, 2, 0])
    np.testing.assert_allclose(
        np.stack([np.asarray(new_st.x)[:3], np.asarray(new_st.y)[:3]], -1),
        positions[[1, 2, 0]])
    np.testing.assert_allclose(np.asarray(new_st.radius)[:3], radii[[1, 2, 0]])
    # prev positions rearranged too
    np.testing.assert_allclose(np.asarray(new_st.px)[:3], positions[[1, 2, 0], 0])
    assert int(new_st.steps_since_sort) == 0
    assert int(new_st.num_active) == 3


def test_inactive_slots_stay_at_tail():
    cfg = SimConfig(max_particles=8, initial_particles=8,
                    world_width=32.0, world_height=32.0, initial_radius=1.0)
    positions = np.array([[20.0, 20.0], [1.0, 1.0]], np.float32)
    st = sl.from_arrays(cfg, positions, np.ones(2, np.float32))
    codes = resort.home_cell_codes(st.x, st.y, st.active_mask(), jnp.float32(2.2))
    assert (np.asarray(codes)[2:] == UNUSED_CELL_ID).all()
    new_st, perm = resort.morton_resort(st, jnp.float32(2.2))
    assert int(new_st.num_active) == 2
    np.testing.assert_array_equal(np.asarray(perm)[:2], [1, 0])
    # active prefix intact: radii nonzero only in first 2 slots
    r = np.asarray(new_st.radius)
    assert (r[:2] > 0).all() and (r[2:] == 0).all()


def test_resort_preserves_simulation_state():
    cfg = SimConfig(max_particles=128, initial_particles=128,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5)
    key = jax.random.key(0)
    st = sl.init_uniform(cfg, key)
    new_st, perm = resort.morton_resort(st, jnp.float32(1.1))
    # same multiset of particles
    np.testing.assert_allclose(np.sort(np.asarray(new_st.x)),
                               np.sort(np.asarray(st.x)), rtol=1e-6)
    # codes are ascending after resort (within active prefix)
    codes = resort.home_cell_codes(
        new_st.x, new_st.y, new_st.active_mask(), jnp.float32(1.1))
    c = np.asarray(codes)[:128]
    assert (np.diff(c.astype(np.int64)) >= 0).all()


def test_resort_permutes_colors_when_tracked():
    """The reference's rearrange skips colors (rearrange.wgsl:26-34) —
    consciously fixed here: all fields ride the permutation."""
    cfg = SimConfig(max_particles=3, initial_particles=3,
                    world_width=32.0, world_height=32.0,
                    initial_radius=1.0, track_colors=True)
    cs = 2.2
    positions = np.array([[3.5 * cs, 1.5 * cs],
                          [0.5 * cs, 0.5 * cs],
                          [1.5 * cs, 1.5 * cs]], np.float32)
    colors = np.eye(3, 4, dtype=np.float32)
    st = sl.from_arrays(cfg, positions, np.ones(3, np.float32), colors=colors)
    new_st, perm = resort.morton_resort(st, jnp.float32(cs))
    np.testing.assert_array_equal(np.asarray(perm)[:3], [1, 2, 0])
    np.testing.assert_allclose(np.asarray(new_st.color)[:3], colors[[1, 2, 0]])


def test_spawn_colors_when_tracked():
    from gpu_physics_engine_tpu import Engine
    cfg = SimConfig(max_particles=256, initial_particles=16,
                    world_width=256.0, world_height=256.0,
                    initial_radius=0.5, track_colors=True,
                    sort_interval_steps=0)
    eng = Engine(cfg, seed=0)
    eng.spawn_at((128.0, 128.0), verbose=False)
    c = np.asarray(eng.state.color)[16:116]
    # reference spawn colors: channels U[0.3, 1.0), alpha 1 (particle_system.rs:201)
    assert (c[:, :3] >= 0.3).all() and (c[:, :3] <= 1.0).all()
    np.testing.assert_array_equal(c[:, 3], 1.0)
