"""gs_layout="par" (ops/gs_parity.py): the persistent parity-space GS
pipeline must be BIT-identical to the flat Pallas GS path — same rank
selection, same ordered color sweeps, same pull-relocate matching, same
integrate — with full-space state crossing the (bit-faithful) mx
relayout only at the step/chunk boundary.

Configs are deliberately tiny (cap 2, K 3, <= 64 particles on a
jittered one-per-cell grid): the parity step compiles ~20
interpret-mode Pallas kernels on the 1-core CI box and interpret
compile time is superlinear in the unrolled select count
(cap x K x 36 per kernel — CLAUDE.md compile discipline; the round-2
cap3/K4 configs cost 18-minute single compiles).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.state import StepParams  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402


def _dense_cfg(**kw):
    base = dict(max_particles=64, initial_particles=64,
                world_width=16.0, world_height=8.0, initial_radius=0.5,
                pipeline="tiled", tiled_solver="gs", tile_multiplier=2.2,
                tile_cap=2, max_occupancy=3,
                tiled_collide="pallas", tiled_relocate="pallas",
                tiled_match="flip")
    base.update(kw)
    return SimConfig(**base)


def _init(cfg, n=64, seed=0):
    """One particle per cell on a jittered grid: storage occupancy can
    never exceed cap=2, so nobody is refused at init and the engine
    pid-conservation assertions stay exact."""
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


def _assert_state_equal(a, b):
    for f in ("pid", "x", "y", "px", "py", "radius"):
        av, bv = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        assert (av == bv).all(), f"{f} differs (max |d|="\
            f"{np.abs(av.astype(np.float64) - bv.astype(np.float64)).max()})"
    assert int(a.overflow_count) == int(b.overflow_count)


def test_to_from_parity_roundtrip_bit_faithful():
    """Conversion is an exact permutation for every field (the mx
    relayout carries 32-bit payloads through u16-split one-hot
    matmuls)."""
    from gpu_physics_engine_tpu.ops.gs_parity import from_parity, to_parity
    cfg = _dense_cfg()
    st = _init(cfg)
    carry = to_parity(st, cfg)
    back = from_parity(carry, st, cfg)
    _assert_state_equal(st, back)


def test_parity_relocate_bit_matches_flat_pull():
    """relocate_parity uses the same matching cores as relocate_pallas
    (_plan_choose/_apply_merge) through cross-parity views: storage
    evolution must be bit-identical, deferral counts included."""
    from gpu_physics_engine_tpu.ops.gs_parity import (from_parity,
                                                      relocate_parity,
                                                      to_parity)
    from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
    for match in ("flip", "greedy"):
        cfg = _dense_cfg(tiled_match=match)
        st = _init(cfg)
        # kick positions so there are real movers (shift everyone by
        # ~0.8 tile edges -> plenty of boundary crossers)
        import dataclasses
        t = tiled.tile_geometry(cfg)[0]
        st = dataclasses.replace(
            st, x=np.clip(np.asarray(st.x) + 0.8 * t, 0.0,
                          cfg.world_width).astype(np.float32))

        flat = relocate_pallas(st, cfg)

        t_, TY, TX = tiled.tile_geometry(cfg)
        subs, na, ovf = to_parity(st, cfg)
        cap = st.dims[0]
        subs2, defer = relocate_parity(subs, cfg, cap, t_, TY, TX)
        par = from_parity((subs2, na, ovf + defer), st, cfg)
        _assert_state_equal(flat, par)


def test_parity_step_bit_matches_flat_gs():
    """One full engine step (relocate -> GS solve -> integrate) through
    gs_parity_tile_step equals the flat-layout tiled_step_fn bitwise."""
    from gpu_physics_engine_tpu.ops.gs_parity import gs_parity_tile_step
    cfg = _dense_cfg()
    st = _init(cfg)
    params = StepParams.make(cfg.dt)

    flat = tiled.tiled_step_fn(st, params, cfg)  # gs_layout auto = flat
    par = gs_parity_tile_step(st, params, cfg, n_steps=1)
    _assert_state_equal(flat, par)


def test_fused_parity_kernels_bitmatch_unfused():
    """gs_par_fused=True (the TPU production path: one kernel per phase
    over all four parities) is bit-identical to the unfused layout —
    rank tables and one relocate pass compared directly (the cheapest
    full coverage of all three fused kernels)."""
    import jax.numpy as jnp
    from gpu_physics_engine_tpu.ops.gs_parity import (rank_parity,
                                                      relocate_parity,
                                                      to_parity)
    cfg_u = _dense_cfg(gs_par_fused=False)
    cfg_f = _dense_cfg(gs_par_fused=True)
    st = _init(cfg_u, n=48)
    t, TY, TX = tiled.tile_geometry(cfg_u)
    cap, K = st.dims[0], cfg_u.max_occupancy
    subs, _, _ = to_parity(st, cfg_u)
    one = jnp.ones((1,), jnp.float32)

    tab_u, ovf_u = rank_parity(subs, one, cfg_u, cap, K, t, TY, TX)
    tab_f, ovf_f = rank_parity(subs, one, cfg_f, cap, K, t, TY, TX)
    for p in tab_u:
        for a, b in zip(tab_u[p], tab_f[p]):
            assert (np.asarray(a) == np.asarray(b)).all()
    assert int(ovf_u) == int(ovf_f)

    ru, du = relocate_parity(subs, cfg_u, cap, t, TY, TX)
    rf, df = relocate_parity(subs, cfg_f, cap, t, TY, TX)
    for n in ru:
        for p in ru[n]:
            assert (np.asarray(ru[n][p]) == np.asarray(rf[n][p])).all()
    assert int(du) == int(df)


def test_parity_engine_wiring():
    """TiledEngine with gs_layout='par' + tiled_collide='pallas' routes
    chunks through the parity step and stays finite/conserving."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _dense_cfg(gs_layout="par")
    eng = TiledEngine(cfg, seed=0, chunk=2)
    eng.run(2)
    pid = np.asarray(eng.state.pid)
    assert (np.sort(pid[pid >= 0]) == np.arange(64)).all()
    assert np.isfinite(np.asarray(eng.state.x)).all()


def test_render_parity_core_matches_full_space():
    """render_parity_core (the parity-GS frame loop's renderer) must
    produce the same image as _render_core on the recomposed full-space
    state — same composite, same resample union, only the f32
    accumulation order differs (tolerance 1 u8 step)."""
    from gpu_physics_engine_tpu.ops.gs_parity import to_parity
    from gpu_physics_engine_tpu.render.device import (autofit_rect,
                                                      render_parity_core,
                                                      render_tiles_device)
    import jax.numpy as jnp
    cfg = _dense_cfg()
    st = _init(cfg)
    W, H = 64, 32
    full = render_tiles_device(st, cfg, width=W, height=H)
    _, TY, TX = tiled.tile_geometry(cfg)
    subs, _, _ = to_parity(st, cfg)
    rect = jnp.asarray(autofit_rect(cfg, W, H), jnp.float32)
    par = np.asarray(render_parity_core(subs, rect, cfg, W, H, TY, TX))
    d = np.abs(full.astype(np.int32) - par.astype(np.int32))
    assert d.max() <= 1, f"max u8 delta {d.max()}"
    # and it actually drew something
    assert int(full.astype(np.int64).sum()) > 0


def test_render_parity_core_nonuniform_radius():
    """The non-uniform branch carries the radius planes through parity
    space (subs['r']) instead of reconstructing from r0."""
    from gpu_physics_engine_tpu.ops.gs_parity import to_parity
    from gpu_physics_engine_tpu.render.device import (autofit_rect,
                                                      render_parity_core,
                                                      render_tiles_device)
    import dataclasses
    import jax.numpy as jnp
    cfg = _dense_cfg(tiled_uniform_radius=False)
    st = _init(cfg)
    rad = np.asarray(st.radius).copy()
    rad[rad > 0] *= 0.7  # break uniformity
    st = dataclasses.replace(st, radius=jnp.asarray(rad))
    W, H = 64, 32
    full = render_tiles_device(st, cfg, width=W, height=H)
    _, TY, TX = tiled.tile_geometry(cfg)
    subs, _, _ = to_parity(st, cfg)
    assert "r" in subs
    rect = jnp.asarray(autofit_rect(cfg, W, H), jnp.float32)
    par = np.asarray(render_parity_core(subs, rect, cfg, W, H, TY, TX))
    d = np.abs(full.astype(np.int32) - par.astype(np.int32))
    assert d.max() <= 1, f"max u8 delta {d.max()}"


def test_render_run_parity_gs_trajectory_lock():
    """render_run on gs_layout='par' must advance the simulation
    bit-identically to plain run() (the render only observes state) and
    return a nonzero checksum."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _dense_cfg(gs_layout="par")
    a = TiledEngine(cfg, seed=0, chunk=2)
    b = TiledEngine(cfg, seed=0, chunk=2)
    acc = a.render_run(2, width=32, height=16)
    b.run(2)
    _assert_state_equal(a.state, b.state)
    assert acc != 0


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
