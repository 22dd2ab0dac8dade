"""Uniform-radius sweep specialization (SimConfig.tiled_uniform_radius).

With every radius == initial_radius the Pallas pair sweep folds
rsum = 2*r0 and the inverse-mass split 1/2 into constants and never
reads the radius planes (ops/tiled_pallas.py::_pair_sweep).  It is NOT
bit-identical to the general kernel (constants replace ulp-level rsqrt
round trips) but resolves the identical pair set, so positions agree to
~1e-5 world units per substep.  The engine must fall back to the
general kernel whenever the premise breaks (mixed-radius init state,
spawns with non-0.5 radii).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.ops import tiled


def _scene(n, seed, w=16.0, h=8.0, r=0.5):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    return pos, np.full(n, r, np.float32)


def _cfg(n, w=16.0, h=8.0, uniform=True, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     world_width=w, world_height=h, initial_radius=0.5,
                     pipeline="tiled", tile_multiplier=4.4, tile_cap=4,
                     sort_interval_steps=0, tiled_collide="pallas",
                     tiled_relocate="jnp",
                     tiled_uniform_radius=uniform, **kw)


def test_uniform_collide_matches_general():
    """Plain collide kernel: same pair set, positions within ulp-scale
    of the general radius-reading kernel."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas
    pos, radii = _scene(300, 0)
    outs = {}
    for uniform in (False, True):
        cfg = _cfg(300, uniform=uniform)
        st = tiled.init_tiles(cfg, pos, radii)
        out = jax.jit(lambda s, c=cfg: collide_pallas(s, c))(st)
        outs[uniform] = (np.asarray(out.x), np.asarray(out.y))
    dx = np.abs(outs[True][0] - outs[False][0]).max()
    dy = np.abs(outs[True][1] - outs[False][1]).max()
    assert dx < 1e-5 and dy < 1e-5, (dx, dy)
    # and the sweep actually moved something (the scene has contacts)
    st0 = tiled.init_tiles(_cfg(300), pos, radii)
    assert np.abs(outs[True][0] - np.asarray(st0.x)).max() > 1e-4


def test_uniform_fused_substep_matches_general():
    """Fused collide+integrate: ulp-scale agreement, world clamp intact."""
    from gpu_physics_engine_tpu.ops.tiled import StepParams
    from gpu_physics_engine_tpu.ops.tiled_pallas import (
        collide_integrate_pallas)
    pos, radii = _scene(300, 1)
    params = StepParams(dt=jnp.float32(0.02), mouse_x=jnp.float32(0.0),
                        mouse_y=jnp.float32(0.0),
                        mouse_pressed=jnp.float32(0.0))
    outs = {}
    for uniform in (False, True):
        cfg = _cfg(300, uniform=uniform)
        st = tiled.init_tiles(cfg, pos, radii)
        out = jax.jit(lambda s, p, c=cfg: collide_integrate_pallas(
            s, p, c))(st, params)
        outs[uniform] = out
    for f in ("x", "y", "px", "py"):
        d = np.abs(np.asarray(getattr(outs[True], f))
                   - np.asarray(getattr(outs[False], f))).max()
        assert d < 1e-5, (f, d)
    occ = np.asarray(outs[True].pid) >= 0
    assert np.asarray(outs[True].x)[occ].min() >= 0.5 - 1e-6


def test_engine_uniform_runs_and_tracks_general():
    """TiledEngine end-to-end with the uniform sweep: finite, close to
    the general engine over a short window, same overflow accounting."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    engs = {}
    for uniform in (False, True):
        e = TiledEngine(_cfg(256, uniform=uniform), seed=3)
        s = e.run(3)
        engs[uniform] = (np.asarray(s.x), np.asarray(s.y),
                         int(s.overflow_count))
    dx = np.abs(engs[True][0] - engs[False][0]).max()
    assert np.isfinite(engs[True][0]).all()
    assert dx < 1e-3, dx  # ulp differences compound over 3 steps
    assert engs[True][2] == engs[False][2]


def test_engine_falls_back_on_mixed_radius_spawn():
    """A spawn with radius != initial_radius must flip the engine to the
    general kernel before insertion (spawned radii are ints 1..3)."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _cfg(400, uniform=True, tile_max_radius=1.0).replace(
        initial_particles=300, max_particles=600, tile_cap=8)
    eng = TiledEngine(cfg, seed=0)
    assert eng.config.tiled_uniform_radius
    eng.spawn_at((8.0, 4.0), count=32)
    assert not eng.config.tiled_uniform_radius
    s = eng.run(2)
    occ = np.asarray(s.pid) >= 0
    assert np.isfinite(np.asarray(s.x)[occ]).all()


def test_engine_init_rejects_mixed_radius_state():
    """A mixed-radius initial state under a uniform config must fall
    back at construction (e.g. checkpoint resume)."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    pos, radii = _scene(200, 5)
    radii[::7] = 0.4
    cfg = _cfg(200, uniform=True)
    st = tiled.init_tiles(cfg, pos, radii)
    eng = TiledEngine(cfg, seed=0, initial_state=st)
    assert not eng.config.tiled_uniform_radius
    out = eng.run(2)
    occ = np.asarray(out.pid) >= 0
    assert np.isfinite(np.asarray(out.x)[occ]).all()
