"""Tile-storage Gauss-Seidel solver (ops/gs_tiled.py) vs the scalar model.

The scalar golden model (tests/reference_model.py) mirrors the reference
shaders line by line; gs_solve must reproduce its positions bit-for-bit
on the same scene — same 4-color schedule, same in-cell ascending-pid
sweep order, same f32 op order — despite a completely different data
layout (persistent tiles instead of a sorted pair array).
"""

import numpy as np
import jax
import jax.numpy as jnp

import reference_model as model
from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.gs_tiled import gs_solve


def _scene(n, seed, w=32.0, h=16.0, rmax=0.5):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    radii = rng.uniform(0.3, rmax, n).astype(np.float32)
    radii[0] = rmax  # pin max radius = cell sizing
    return pos, radii


def _tile_cfg(n, w=32.0, h=16.0, cap=8, K=8):
    return SimConfig(max_particles=n, initial_particles=n,
                     world_width=w, world_height=h,
                     initial_radius=0.5, pipeline="tiled",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=K,
                     sort_interval_steps=0, tiled_collide="jnp",
                     tiled_relocate="jnp")


def _gs_positions(cfg, pos, radii):
    st = tiled.init_tiles(cfg, pos, radii)
    assert int(st.overflow_count) == 0, "test scene must fit"
    # gs_solve assumes storage tile == home cell (spilled particles are
    # invisible to cells on the far side); assert the scene packed clean
    occ = np.asarray(st.pid) >= 0
    _, ty, tx = np.nonzero(occ)
    t = tiled.tile_geometry(cfg)[0]
    want_ty = (np.asarray(st.y)[occ] // t).astype(int) + 1
    want_tx = (np.asarray(st.x)[occ] // t).astype(int) + 1
    assert (ty == want_ty).all() and (tx == want_tx).all(), "spill at init"
    out = jax.jit(lambda s: gs_solve(s, cfg))(st)
    pid, p, _, _ = tiled.export_particles(out)
    order = np.argsort(pid)
    return p[order], int(out.overflow_count)


def _model_positions(pos, radii, cell_size, K=None):
    cells, objs = model.build_cell_ids(pos, radii, cell_size)
    sc, so = model.sort_map(cells, objs)
    return model.solve_colored(pos, radii, sc, so, stiffness=0.6,
                               max_occupancy=K)


def test_gs_tiled_bitmatches_scalar_model():
    for seed in (0, 1, 2):
        pos, radii = _scene(220, seed)
        cfg = _tile_cfg(220)
        got, overflow = _gs_positions(cfg, pos, radii)
        want = _model_positions(pos, radii, cell_size=1.1)
        assert overflow == 0
        np.testing.assert_array_equal(got, want.astype(np.float32))


def test_gs_tiled_dense_pack_bitmatches():
    """A deliberately jammed cluster: multi-occupant cells, chained
    corrections across colors."""
    rng = np.random.default_rng(7)
    n = 60
    pos = (np.array([8.0, 8.0], np.float32)
           + rng.normal(0.0, 2.6, (n, 2)).astype(np.float32))
    pos = np.clip(pos, 0.6, 15.4).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    cfg = _tile_cfg(n, w=16.0, h=16.0, cap=12, K=6)
    got, _ = _gs_positions(cfg, pos, radii)
    want = _model_positions(pos, radii, cell_size=1.1, K=6)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_gs_pallas_bitmatches_model_and_jnp():
    """The Pallas band-kernel lowering (ops/gs_pallas.py) reproduces the
    scalar model AND the jnp formulation bit-for-bit (interpret mode)."""
    from gpu_physics_engine_tpu.ops.gs_pallas import gs_solve_pallas

    pos, radii = _scene(220, 0)
    cfg = _tile_cfg(220, K=6)
    st = tiled.init_tiles(cfg, pos, radii)
    out_p = jax.jit(lambda s: gs_solve_pallas(s, cfg))(st)
    out_j = jax.jit(lambda s: gs_solve(s, cfg))(st)
    np.testing.assert_array_equal(np.asarray(out_p.x), np.asarray(out_j.x))
    np.testing.assert_array_equal(np.asarray(out_p.y), np.asarray(out_j.y))
    assert int(out_p.overflow_count) == int(out_j.overflow_count)

    pid, p, _, _ = tiled.export_particles(out_p)
    got = p[np.argsort(pid)]
    want = _model_positions(pos, radii, cell_size=1.1, K=6)
    np.testing.assert_array_equal(got, want.astype(np.float32))


# odd/even interior-dimension mix for the layout-parity tests (12.0/1.1
# -> TX 13 odd, TY 10 even; 11.3/7.7 -> 13 x 9 both odd)
_LAYOUT_SCENES = ((0, (12.0, 8.0)), (4, (11.3, 7.7)))


def test_gs_pallas_decomposed_bitmatches_flat():
    """The 2x2 color-decomposed kernels (gs_layout='dec') reproduce the
    flat masked formulation bit-for-bit — same op order on a 4x smaller
    per-color grid — including odd interior dimensions (TYi/TXi parity
    padding) and the occupancy clamp."""
    from gpu_physics_engine_tpu.ops.gs_pallas import (
        gs_solve_pallas_dec, gs_solve_pallas_flat)

    # small cap/K/world on purpose: interpret-mode kernel graphs grow
    # with K*36*cap (unrolled selects) x grid blocks, and CPU XLA
    # compile time is superlinear in op count — the 220-particle
    # cap8/K6 version of this test compiled for 45 MINUTES on a 1-core
    # box.  Layout equivalence doesn't need big slot counts; odd/even
    # interior dims are what matter (parity padding).
    for seed, (w, h) in _LAYOUT_SCENES:
        pos, radii = _scene(120, seed, w=w, h=h)
        cfg = _tile_cfg(120, w=w, h=h, cap=4, K=4)
        st = tiled.init_tiles(cfg, pos, radii)
        out_d = jax.jit(lambda s: gs_solve_pallas_dec(s, cfg))(st)
        out_f = jax.jit(lambda s: gs_solve_pallas_flat(s, cfg))(st)
        np.testing.assert_array_equal(np.asarray(out_d.x),
                                      np.asarray(out_f.x))
        np.testing.assert_array_equal(np.asarray(out_d.y),
                                      np.asarray(out_f.y))
        assert (int(out_d.overflow_count) == int(out_f.overflow_count))


def test_mx_relayout_roundtrip_bit_faithful():
    """The one-hot-matmul relayout of gs_layout='mx' is bit-faithful for
    ANY 32-bit payload (u16-half splitting never relies on matmul
    internals): decompose matches numpy parity slicing and the
    round-trip reproduces input bits exactly — NaN payloads included."""
    from gpu_physics_engine_tpu.ops.gs_pallas import (
        _PARS, _mx_blocks, _mx_decompose, _mx_geometry, _mx_onehot,
        _mx_recompose)

    rng = np.random.default_rng(0)
    for TY, TX, C, dtype, fill in [(37, 300, 3, np.float32, 0.0),
                                   (256, 256, 2, np.int32, -1)]:
        if dtype == np.float32:
            a = rng.standard_normal((C, TY, TX)).astype(np.float32) * 1e3
            a[0, 0, 0] = np.float32(np.nan)
        else:
            a = rng.integers(-1, 2**31 - 1, (C, TY, TX), dtype=np.int32)
        by, bx = _mx_blocks(TY, TX)
        Ey, Ex = _mx_onehot(by), _mx_onehot(bx)
        subs = _mx_decompose(jnp.asarray(a), TY, TX, fill, Ey, Ex)
        TYp, TXp, _, _ = _mx_geometry(TY, TX)
        ap = np.full((C, TYp, TXp), fill, dtype)
        ap[:, :TY, :TX] = a
        for (pa, pb) in _PARS:
            np.testing.assert_array_equal(
                np.asarray(subs[(pa, pb)]).view(np.uint32),
                ap[:, pa::2, pb::2].view(np.uint32))
        back = np.asarray(_mx_recompose(subs, TY, TX, jnp.dtype(dtype),
                                        Ey, Ex))
        np.testing.assert_array_equal(back.view(np.uint32),
                                      a.view(np.uint32))
        if dtype == np.float32:
            # raw-f32 mode (gs_mx_split=False) is FINITE-ONLY: a NaN
            # source would leak across the one-hot zeros (0 * NaN = NaN)
            # — positions are finite by invariant.  Exact on CPU; TPU
            # exactness is probed by scripts/tpu_probe_gsmx.py.
            af = np.nan_to_num(a, nan=1.25)
            apf = np.nan_to_num(ap, nan=1.25)
            subs_r = _mx_decompose(jnp.asarray(af), TY, TX, fill, Ey, Ex,
                                   split=False)
            for (pa, pb) in _PARS:
                np.testing.assert_array_equal(
                    np.asarray(subs_r[(pa, pb)]).view(np.uint32),
                    apf[:, pa::2, pb::2].view(np.uint32))
            back_r = np.asarray(_mx_recompose(
                subs_r, TY, TX, jnp.dtype(dtype), Ey, Ex, split=False))
            np.testing.assert_array_equal(back_r.view(np.uint32),
                                          af.view(np.uint32))


def test_gs_pallas_mx_bitmatches_flat():
    """gs_layout='mx' (decomposed kernels + matmul relayouts, no border
    ring — the full grid's own pad tiles play the fill role) reproduces
    the flat formulation bit-for-bit, odd dimensions included."""
    from gpu_physics_engine_tpu.ops.gs_pallas import (
        gs_solve_pallas, gs_solve_pallas_flat)

    # small cap/K/world for compile cost — see the dec test above; the
    # flat jits are shared with it through the compilation cache.
    # Routed through the gs_layout dispatcher on purpose (wiring check).
    for seed, (w, h) in _LAYOUT_SCENES:
        pos, radii = _scene(120, seed, w=w, h=h)
        cfg = _tile_cfg(120, w=w, h=h, cap=4, K=4)
        cfg_mx = cfg.replace(gs_layout="mx")
        st = tiled.init_tiles(cfg, pos, radii)
        out_m = jax.jit(lambda s: gs_solve_pallas(s, cfg_mx))(st)
        out_f = jax.jit(lambda s: gs_solve_pallas_flat(s, cfg))(st)
        np.testing.assert_array_equal(np.asarray(out_m.x),
                                      np.asarray(out_f.x))
        np.testing.assert_array_equal(np.asarray(out_m.y),
                                      np.asarray(out_f.y))
        assert (int(out_m.overflow_count) == int(out_f.overflow_count))


def test_gs_engine_matches_array_colored_engine():
    """The GS tiled engine (tiled_solver='gs') tracks the array engine's
    colored solver — same reference semantics, different storage — over
    multiple steps on the same scene."""
    from gpu_physics_engine_tpu import Engine, SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    rng = np.random.default_rng(3)
    n = 150
    w, h = 24.0, 12.0
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)

    tcfg = SimConfig(max_particles=n, initial_particles=n,
                     world_width=w, world_height=h, initial_radius=0.5,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=8, max_occupancy=8,
                     sort_interval_steps=0, tiled_collide="jnp",
                     tiled_relocate="jnp", gravity=(0.0, -20.0))
    acfg = tcfg.replace(pipeline="sorted", solver="colored")

    te = TiledEngine.from_arrays(tcfg, pos, radii)
    ae = Engine.from_arrays(acfg, pos, radii)
    te.run(8)
    ae.run(8)
    got = te.positions()
    want = ae.positions()
    # both solvers bit-match the scalar model per call, but the two
    # INTEGRATORS are separate implementations whose mul+add chains may
    # contract differently — contact dynamics amplify the ulp seeds over
    # 8 steps.  The amplification is MACHINE-dependent (XLA:CPU picks
    # different fma contraction per host: measured max|diff| 1.08e-4
    # after 8 steps on the round-2 session-4 box vs <1e-4 on the
    # round-1 box), so the macro tolerance carries margin; structural
    # divergence (wrong pair set / ordering) shows up at >1e-2 within
    # 2 steps, and the bit-exact oracle tests guard real solver
    # regressions (test_step.py, test_gs_tiled parity tests).
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_gs_tiled_occupancy_clamp_matches_model():
    """Runs longer than K clamp to the K smallest ids on both sides, and
    the clamped tail is counted in overflow_count."""
    n = 12  # 12 particles stacked into one cell, K = 4
    pos = np.tile(np.array([[5.05, 5.05]], np.float32), (n, 1))
    pos += np.linspace(0, 0.02, n, dtype=np.float32)[:, None]
    radii = np.full(n, 0.5, np.float32)
    cfg = _tile_cfg(n, w=16.0, h=16.0, cap=16, K=4)
    got, overflow = _gs_positions(cfg, pos, radii)
    want = _model_positions(pos, radii, cell_size=1.1, K=4)
    np.testing.assert_array_equal(got, want.astype(np.float32))
    assert overflow > 0


def test_gs_engine_mx_layout_matches_flat_engine():
    """End-to-end wiring: a TiledEngine with tiled_solver='gs' and
    gs_layout='mx' produces bit-identical trajectories to gs_layout=
    'flat' (the mx relayouts are bit-faithful, so the ENGINES must
    agree exactly, not just the isolated solves).  Small cap/K world
    per the compile-cost discipline (CLAUDE.md)."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    rng = np.random.default_rng(7)
    n = 90
    w, h = 12.0, 8.0
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    base = SimConfig(max_particles=n, initial_particles=n,
                     world_width=w, world_height=h, initial_radius=0.5,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=4, max_occupancy=4,
                     sort_interval_steps=0, tiled_collide="jnp",
                     tiled_relocate="jnp", gravity=(0.0, -20.0))
    ef = TiledEngine.from_arrays(base.replace(gs_layout="flat"),
                                 pos, radii)
    em = TiledEngine.from_arrays(base.replace(gs_layout="mx"),
                                 pos, radii)
    ef.run(6)
    em.run(6)
    np.testing.assert_array_equal(ef.positions(), em.positions())
    assert (int(ef.state.overflow_count) == int(em.state.overflow_count))
