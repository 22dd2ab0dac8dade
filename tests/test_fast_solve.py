"""Gather-free fast solver tests: golden Jacobi model + end-to-end sanity."""

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu import Engine, SimConfig
from gpu_physics_engine_tpu.ops import fast_solve
import reference_model as ref

CELL = 2.2


def _jacobi_golden(positions, radii, cell_size, stiffness=0.6):
    """Scalar model: unique-pair corrections summed, applied simultaneously.
    Pairs are discovered per shared cell but deduped to the cell containing
    the contact point (mirrors ops/fast_solve.py's canonical-cell rule)."""
    positions = np.asarray(positions, np.float64)
    radii = np.asarray(radii, np.float64)
    cells, objs = ref.build_cell_ids(positions, radii, cell_size)
    occupants = {}
    for c, o in zip(cells, objs):
        if c != ref.UNUSED:
            occupants.setdefault(int(c), []).append(int(o))
    delta = np.zeros_like(positions)
    for cell, occ in occupants.items():
        for a in range(len(occ)):
            for b in range(a + 1, len(occ)):
                i, j = occ[a], occ[b]
                d = positions[i] - positions[j]
                dist = np.sqrt((d * d).sum())
                rsum = radii[i] + radii[j]
                if rsum ** 2 > dist ** 2 and dist > 1e-4:
                    contact = positions[i] - d * (radii[i] / rsum)
                    ccell = ref.morton_encode(
                        int(np.floor(np.float32(contact[0]) / np.float32(cell_size))),
                        int(np.floor(np.float32(contact[1]) / np.float32(cell_size))))
                    if ccell != cell:
                        continue  # counted in its canonical cell only
                    corr = d / dist * (rsum - dist) * stiffness
                    delta[i] += corr * (radii[j] / rsum)
                    delta[j] -= corr * (radii[i] / rsum)
    return positions + delta


def _solve(positions, radii, cfg):
    positions = np.asarray(positions, np.float32)
    radii = np.asarray(radii, np.float32)
    n = len(radii)
    cap = cfg.capacity
    x = jnp.zeros(cap, jnp.float32).at[:n].set(positions[:, 0])
    y = jnp.zeros(cap, jnp.float32).at[:n].set(positions[:, 1])
    r = jnp.zeros(cap, jnp.float32).at[:n].set(radii)
    active = jnp.arange(cap) < n
    nx, ny, ovf = fast_solve.solve_fast(
        x, y, r, active, jnp.float32(CELL), cfg)
    return (np.stack([np.asarray(nx)[:n], np.asarray(ny)[:n]], -1), int(ovf))


def _cfg(n, K=8, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     world_width=64.0, world_height=64.0,
                     initial_radius=1.0, max_occupancy=K,
                     fast_pack_bf16=False, **kw)


def test_single_pair_matches_colored_semantics():
    # one pair in one cell: Jacobi == Gauss-Seidel
    positions = [[CELL / 2 - 0.4, CELL / 2], [CELL / 2 + 0.4, CELL / 2]]
    got, ovf = _solve(positions, [0.5, 0.5], _cfg(2))
    assert ovf == 0
    np.testing.assert_allclose(got[0], [CELL / 2 - 0.46, CELL / 2], rtol=1e-6)
    np.testing.assert_allclose(got[1], [CELL / 2 + 0.46, CELL / 2], rtol=1e-6)


def test_matches_jacobi_golden_model():
    rng = np.random.default_rng(10)
    n = 70
    positions = rng.uniform(3.0, 60.0, size=(n, 2)).astype(np.float32)
    radii = rng.uniform(0.6, 1.0, size=n).astype(np.float32)
    got, ovf = _solve(positions, radii, _cfg(n, K=16))
    assert ovf == 0
    want = _jacobi_golden(positions, radii, CELL)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_overflow_counted_for_long_runs():
    n = 20
    positions = [[3.0, 3.0]] * n
    _, ovf = _solve(positions, [1.0] * n, _cfg(n, K=8))
    assert ovf > 0


def test_end_to_end_fast_solver():
    cfg = SimConfig(max_particles=512, initial_particles=512,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, sort_interval_steps=8,
                    solver="fast")
    eng = Engine(cfg, seed=0)
    st = eng.run(60)
    n = 512
    x = np.asarray(st.x)[:n]
    y = np.asarray(st.y)[:n]
    r = np.asarray(st.radius)[:n]
    assert np.isfinite(x).all() and np.isfinite(y).all()
    assert (x >= r - 1e-5).all() and (x <= 64.0 - r + 1e-5).all()
    assert (y >= r - 1e-5).all() and (y <= 64.0 - r + 1e-5).all()

    # overlap decreases relative to the raw initial scene
    def total_pen(xx, yy):
        p = np.stack([xx, yy], -1)
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        pen = np.maximum(2 * 0.5 - d, 0.0)
        return np.triu(pen, 1).sum()

    e0 = Engine(cfg, seed=0)
    assert total_pen(x, y) < total_pen(
        np.asarray(e0.state.x)[:n], np.asarray(e0.state.y)[:n])


def test_fast_solver_deterministic():
    cfg = SimConfig(max_particles=256, initial_particles=256,
                    world_width=64.0, world_height=64.0,
                    initial_radius=0.5, solver="fast")
    a = Engine(cfg, seed=5).run(30)
    b = Engine(cfg, seed=5).run(30)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
