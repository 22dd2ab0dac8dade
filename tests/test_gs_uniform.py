"""Uniform-radius GS specialization (ops/gs_parity.py, keyed off
SimConfig.tiled_uniform_radius): the radius planes are never read (and
since round 3 not even carried through parity space — gs_parity._flds),
the rank tables carry no rrad, and the sweep's rsum/mass-split are
compile-time f32 constants.

Bit-equality scope (calibrated round 3): the rank TABLES are bitwise
identical on every backend (pure integer/select dataflow).  Full-step
POSITION bit-equality holds on TPU hardware (scripts/tpu_probe_gsuni.py:
64k 8-step xcheck dx = dy = 0.0, docs/probes_r2s5/tpu_probe_gsuni.jsonl)
but NOT on XLA:CPU — a fresh-cache CPU run still drifts ~2e-6 (XLA CPU
contracts the general path's r+rk chains differently from the folded
constants), so the CPU step test asserts the documented 1e-4 macro
tolerance with identical pids/overflow, and the hardware probe is the
bit-lock.

Configs tiny (cap 2, K 3, 48 particles on a jittered one-per-cell grid)
per the CPU compile discipline (CLAUDE.md): the round-2 cap3/K4 config
cost an 18-minute XLA:CPU compile for the step scan alone.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.state import StepParams  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402


def _cfg(**kw):
    base = dict(max_particles=64, initial_particles=48,
                world_width=16.0, world_height=8.0, initial_radius=0.5,
                pipeline="tiled", tiled_solver="gs", tile_multiplier=2.2,
                tile_cap=2, max_occupancy=3,
                tiled_collide="pallas", tiled_relocate="pallas",
                tiled_match="flip")
    base.update(kw)
    return SimConfig(**base)


def _init(cfg, n=48, seed=0):
    """One particle per cell on a jittered grid: occupancy can never
    exceed cap=2 even after a couple of steps of drift."""
    rng = np.random.default_rng(seed)
    t = 2.2 * cfg.initial_radius
    cols = int((cfg.world_width - 2.0) / t)
    xs, ys = [], []
    for i in range(n):
        cy, cx = divmod(i, cols)
        xs.append(1.0 + cx * t + rng.uniform(0.1, t - 0.1))
        ys.append(1.0 + cy * t + rng.uniform(0.1, t - 0.1))
    pos = np.stack([xs, ys], -1).astype(np.float32)
    pos[:, 0] = np.clip(pos[:, 0], 0.6, cfg.world_width - 0.6)
    pos[:, 1] = np.clip(pos[:, 1], 0.6, cfg.world_height - 0.6)
    rad = np.full(n, cfg.initial_radius, np.float32)
    return tiled.init_tiles(cfg, pos, rad)


@pytest.mark.parametrize("fused", [False, True])
def test_uniform_rank_tables_bitmatch_general(fused):
    """src/rpid tables, rrad=None, and overflow accounting match the
    general rank bitwise — fused and unfused kernels."""
    import jax.numpy as jnp
    from gpu_physics_engine_tpu.ops.gs_parity import rank_parity, to_parity
    cfg_g = _cfg(gs_par_fused=fused)
    cfg_u = _cfg(gs_par_fused=fused, tiled_uniform_radius=True)
    st = _init(cfg_g)
    t, TY, TX = tiled.tile_geometry(cfg_g)
    cap, K = st.dims[0], cfg_g.max_occupancy
    subs, _, _ = to_parity(st, cfg_g)
    one = jnp.ones((1,), jnp.float32)

    tg, og = rank_parity(subs, one, cfg_g, cap, K, t, TY, TX)
    tu, ou = rank_parity(subs, one, cfg_u, cap, K, t, TY, TX)
    for p in tg:
        assert (np.asarray(tg[p][0]) == np.asarray(tu[p][0])).all()
        assert (np.asarray(tg[p][1]) == np.asarray(tu[p][1])).all()
        assert tu[p][2] is None and tg[p][2] is not None
    assert int(og) == int(ou)


def test_uniform_step_matches_general():
    """Two full parity engine steps (relocate -> rank -> 4 color
    sweeps -> integrate) with the uniform-radius kernels: identical
    pids/overflow and positions within the documented 1e-4 CPU macro
    tolerance (bit-exact ON HARDWARE — see module docstring).  Also
    covers the round-3 radius-plane drop: the reconstructed radius
    plane must equal the carried one bitwise (pure where(pid>=0, r0, 0)
    dataflow — no float arithmetic, so exact everywhere)."""
    from gpu_physics_engine_tpu.ops.gs_parity import gs_parity_tile_step
    cfg_g = _cfg()
    cfg_u = _cfg(tiled_uniform_radius=True)
    st = _init(cfg_g)
    params = StepParams.make(cfg_g.dt)

    fg = gs_parity_tile_step(st, params, cfg_g, n_steps=2)
    fu = gs_parity_tile_step(st, params, cfg_u, n_steps=2)
    assert (np.asarray(fg.pid) == np.asarray(fu.pid)).all()
    assert (np.asarray(fg.radius) == np.asarray(fu.radius)).all()
    for f in ("x", "y", "px", "py"):
        a, b = np.asarray(getattr(fg, f)), np.asarray(getattr(fu, f))
        assert np.abs(a - b).max() < 1e-4, (f, np.abs(a - b).max())
    assert int(fg.overflow_count) == int(fu.overflow_count)


def test_fused_integrate_matches_separate():
    """gs_fuse_integrate (Verlet fused into the color-4 apply) equals
    the separate integrate pass: identical pids/radius/overflow,
    positions within the CPU macro tolerance (the fused path is the
    same op order inside the kernel; XLA:CPU contraction differences
    across graphs bound the guarantee here — hardware holds the bit
    xcheck, scripts/tpu_probe_gs_opt2.py)."""
    from gpu_physics_engine_tpu.ops.gs_parity import gs_parity_tile_step
    cfg_a = _cfg(tiled_uniform_radius=True, gs_fuse_integrate=False)
    cfg_b = _cfg(tiled_uniform_radius=True, gs_fuse_integrate=True)
    st = _init(cfg_a)
    params = StepParams.make(cfg_a.dt, mouse=(8.0, 4.0), pressed=True)

    fa = gs_parity_tile_step(st, params, cfg_a, n_steps=2)
    fb = gs_parity_tile_step(st, params, cfg_b, n_steps=2)
    assert (np.asarray(fa.pid) == np.asarray(fb.pid)).all()
    assert (np.asarray(fa.radius) == np.asarray(fb.radius)).all()
    for f in ("x", "y", "px", "py"):
        a, b = np.asarray(getattr(fa, f)), np.asarray(getattr(fb, f))
        assert np.abs(a - b).max() < 1e-4, (f, np.abs(a - b).max())
    assert int(fa.overflow_count) == int(fb.overflow_count)


def test_uniform_engine_guard_falls_back_on_mixed_radii():
    """TiledEngine's uniform-premise validation (the same guard the
    Jacobi sweep rides) must disable the flag when radii are mixed, so
    the GS uniform kernels can trust r == initial_radius."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _cfg(gs_layout="par", tiled_uniform_radius=True,
               initial_particles=32, max_particles=64)
    eng = TiledEngine(cfg, seed=0, chunk=2)
    assert eng.config.tiled_uniform_radius  # uniform init keeps it

    st = _init(cfg, n=32, seed=1)
    import dataclasses
    # flip one live slot's radius to 1.04x r0: mixed, but its diameter
    # (1.04) still fits the tile edge (2.2 * 0.5 = 1.1)
    rad = np.asarray(st.radius).copy()
    live = np.nonzero(np.asarray(st.pid).ravel() >= 0)[0]
    flat = rad.ravel()
    flat[live[3]] = np.float32(cfg.initial_radius * 1.04)
    st = dataclasses.replace(st, radius=jax.numpy.asarray(
        flat.reshape(rad.shape)))
    eng2 = TiledEngine(cfg, initial_state=st)
    assert not eng2.config.tiled_uniform_radius


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
