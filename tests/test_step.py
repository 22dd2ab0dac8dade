"""End-to-end step tests: invariants, determinism, golden single-step parity."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu import Engine, SimConfig, StepParams
from gpu_physics_engine_tpu.core import state as sl
from gpu_physics_engine_tpu.core.stepper import make_step
import pytest

import reference_model as ref


def _small_cfg(**kw):
    base = dict(max_particles=512, initial_particles=512,
                world_width=64.0, world_height=64.0,
                initial_radius=0.5, sort_interval_steps=16,
                max_occupancy=8)
    base.update(kw)
    return SimConfig(**base)


@pytest.mark.quick
def test_single_step_matches_golden_model():
    """One full frame (no resort) vs the scalar numpy model: grid -> sorted
    pairs -> 4-color GS solve -> Verlet."""
    rng = np.random.default_rng(11)
    n = 64
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=32.0, world_height=32.0,
                    initial_radius=1.0, max_occupancy=16,
                    sort_interval_steps=0)  # disable resort
    positions = rng.uniform(2.0, 30.0, size=(n, 2)).astype(np.float32)
    prev = positions + rng.normal(0, 0.01, size=(n, 2)).astype(np.float32)
    radii = np.full(n, 1.0, np.float32)
    st = sl.from_arrays(cfg, positions, radii, previous_positions=prev)

    step = make_step(cfg)
    out = step(st, StepParams.make(cfg.dt))
    got = np.stack([np.asarray(out.x)[:n], np.asarray(out.y)[:n]], -1)

    cs = cfg.cell_size_multiplier * 1.0
    wc, wo = ref.sort_map(*ref.build_cell_ids(positions, radii, cs))
    solved = ref.solve_colored(positions, radii, wc, wo, cfg.stiffness,
                               max_occupancy=cfg.max_occupancy)
    want, _ = ref.verlet(solved, prev, radii, cfg.dt, (32.0, 32.0))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_invariants_over_many_steps():
    cfg = _small_cfg()
    eng = Engine(cfg, seed=0)
    st = eng.run(100)
    n = int(st.num_active)
    assert n == 512
    x = np.asarray(st.x)[:n]
    y = np.asarray(st.y)[:n]
    r = np.asarray(st.radius)[:n]
    assert np.isfinite(x).all() and np.isfinite(y).all()
    assert (x >= r - 1e-5).all() and (x <= 64.0 - r + 1e-5).all()
    assert (y >= r - 1e-5).all() and (y <= 64.0 - r + 1e-5).all()


@pytest.mark.quick
def test_determinism_same_seed():
    """Same seed => bitwise-identical trajectory (SURVEY.md §5: the colored
    solver is deterministic given fixed cell order)."""
    outs = []
    for _ in range(2):
        eng = Engine(_small_cfg(), seed=42)
        st = eng.run(50)
        outs.append((np.asarray(st.x), np.asarray(st.y)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_pipelines_agree_end_to_end():
    cfg_s = _small_cfg(pipeline="sorted", sort_interval_steps=0)
    cfg_b = _small_cfg(pipeline="bucket", sort_interval_steps=0)
    e1 = Engine(cfg_s, seed=3)
    e2 = Engine(cfg_b, seed=3)
    s1 = e1.run(20)
    s2 = e2.run(20)
    np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1.y), np.asarray(s2.y), atol=1e-4)


def test_resort_does_not_change_collision_free_physics():
    """In a collision-free (dilute) scene a resort is a pure permutation:
    the particle multiset evolves identically with and without resorting.

    (With collisions, resorting renumbers particles and therefore changes
    the Gauss-Seidel pair order — true of the reference as well, where the
    rearrange step rewrites object ids.)"""
    cfg_no = _small_cfg(initial_particles=64, max_particles=64,
                        world_width=512.0, world_height=512.0,
                        sort_interval_steps=0)
    cfg_yes = cfg_no.replace(sort_interval_steps=3)
    s1 = Engine(cfg_no, seed=7).run(30)
    s2 = Engine(cfg_yes, seed=7).run(30)
    p1 = np.sort(np.stack([np.asarray(s1.x), np.asarray(s1.y)], -1), axis=0)
    p2 = np.sort(np.stack([np.asarray(s2.x), np.asarray(s2.y)], -1), axis=0)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_mouse_attractor_pulls_particles():
    cfg = _small_cfg(initial_particles=16, max_particles=16)
    eng = Engine(cfg, seed=1)
    target = (32.0, 32.0)
    d0 = np.linalg.norm(eng.positions() - target, axis=-1).mean()
    eng.press_mouse(target)
    eng.run(30)
    d1 = np.linalg.norm(eng.positions() - target, axis=-1).mean()
    assert d1 < d0


def test_gravity_config():
    cfg = _small_cfg(initial_particles=8, max_particles=8,
                     gravity=(0.0, -98.0))
    eng = Engine(cfg, seed=2)
    y0 = eng.positions()[:, 1].mean()
    eng.run(30)
    y1 = eng.positions()[:, 1].mean()
    assert y1 < y0


def test_substeps():
    cfg = _small_cfg(substeps=4)
    eng = Engine(cfg, seed=0)
    st = eng.run(10)
    assert np.isfinite(np.asarray(st.x)).all()


def test_dt_is_dynamic_no_recompile():
    cfg = _small_cfg()
    eng = Engine(cfg, seed=0)
    eng.step(StepParams.make(1 / 60))
    lowered = eng._step._cache_size() if hasattr(eng._step, "_cache_size") else None
    eng.step(StepParams.make(1 / 120))
    if lowered is not None:
        assert eng._step._cache_size() == lowered


def test_circular_world_constraint():
    """world_shape="circle": the reference's commented-out circular world
    (particle_integration.wgsl:79-92) — everyone stays inside the
    inscribed circle."""
    cfg = _small_cfg(initial_particles=64, max_particles=64,
                     world_width=32.0, world_height=32.0,
                     gravity=(40.0, -40.0), world_shape="circle")
    eng = Engine(cfg, seed=0)
    eng.run(60)
    p = eng.positions()
    r = eng.radii()
    d = np.linalg.norm(p - np.array([16.0, 16.0]), axis=-1)
    assert (d <= 16.0 - r + 1e-4).all()
    assert np.isfinite(p).all()
