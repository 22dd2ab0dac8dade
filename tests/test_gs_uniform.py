"""Uniform-radius GS specialization (ops/gs_parity.py, keyed off
SimConfig.tiled_uniform_radius): the radius planes are never read, the
rank tables carry no rrad, and the sweep's rsum/mass-split are
compile-time f32 constants — all BIT-identical to the general parity
path on CPU (every dropped op is replaced by the same-valued constant;
the constants are computed with the exact runtime numpy-f32 op
sequence).

Configs tiny (cap <= 3, K <= 4, 64 particles) per the CPU compile
discipline (CLAUDE.md).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.state import StepParams  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402


def _cfg(**kw):
    base = dict(max_particles=64, initial_particles=64,
                world_width=16.0, world_height=8.0, initial_radius=0.5,
                pipeline="tiled", tiled_solver="gs", tile_multiplier=2.2,
                tile_cap=3, max_occupancy=4,
                tiled_collide="pallas", tiled_relocate="pallas",
                tiled_match="flip")
    base.update(kw)
    return SimConfig(**base)


def _init(cfg, n=64, seed=0):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0.6, cfg.world_width - 0.6, n),
                    rng.uniform(0.6, cfg.world_height - 0.6, n)],
                   -1).astype(np.float32)
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


def test_uniform_step_bitmatches_general():
    """Two full parity engine steps (relocate -> rank -> 4 color
    sweeps -> integrate) with the uniform-radius kernels equal the
    general path bitwise."""
    from gpu_physics_engine_tpu.ops.gs_parity import gs_parity_tile_step
    cfg_g = _cfg()
    cfg_u = _cfg(tiled_uniform_radius=True)
    st = _init(cfg_g)
    params = StepParams.make(cfg_g.dt)

    fg = gs_parity_tile_step(st, params, cfg_g, n_steps=2)
    fu = gs_parity_tile_step(st, params, cfg_u, n_steps=2)
    for f in ("pid", "x", "y", "px", "py", "radius"):
        a, b = np.asarray(getattr(fg, f)), np.asarray(getattr(fu, f))
        assert (a == b).all(), (
            f, np.abs(a.astype(np.float64) - b.astype(np.float64)).max())
    assert int(fg.overflow_count) == int(fu.overflow_count)


def test_uniform_engine_guard_falls_back_on_mixed_radii():
    """TiledEngine's uniform-premise validation (the same guard the
    Jacobi sweep rides) must disable the flag when radii are mixed, so
    the GS uniform kernels can trust r == initial_radius."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _cfg(gs_layout="par", tiled_uniform_radius=True,
               initial_particles=32, max_particles=64)
    eng = TiledEngine(cfg, seed=0, chunk=2)
    assert eng.config.tiled_uniform_radius  # uniform init keeps it

    rng = np.random.default_rng(1)
    pos = np.stack([rng.uniform(0.6, cfg.world_width - 0.6, 32),
                    rng.uniform(0.6, cfg.world_height - 0.6, 32)],
                   -1).astype(np.float32)
    rad = np.full(32, cfg.initial_radius, np.float32)
    rad[3] = cfg.initial_radius * 1.5
    eng2 = TiledEngine(cfg, initial_state=tiled.init_tiles(cfg, pos, rad))
    assert not eng2.config.tiled_uniform_radius


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
