"""Newton's-third-law pair sweep (SimConfig.tiled_newton).

The Newton sweep (ops/tiled_pallas.py::_pair_sweep_newton) evaluates each
cross-tile pair ONCE — self tile + 4 forward offsets instead of all 9 —
and scatters the reaction half back by rolling the per-slot reaction
planes to the partner tile; reactions that cross a band seam ride a VMEM
scratch carry between the sequential grid steps.  Pair set and per-pair
math are identical to the standard sweep; only the accumulation ORDER
differs, so positions agree to f32 rounding (~1e-6 world units per
substep), not bitwise.

CPU discipline: cap <= 4, tiny worlds, tiled_relocate="jnp" (compile cost
is superlinear in the unroll size on the 1-core test box — CLAUDE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.ops import tiled


def _scene(n, seed, w=16.0, h=60.0, r=0.5):
    """Tall world -> several 8-row bands, so the seam spill carry runs."""
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    return pos, np.full(n, r, np.float32)


def _cfg(n, w=16.0, h=60.0, **kw):
    kw.setdefault("tiled_uniform_radius", False)
    kw.setdefault("tiled_newton", True)
    return SimConfig(max_particles=n, initial_particles=n,
                     world_width=w, world_height=h, initial_radius=0.5,
                     pipeline="tiled", tile_multiplier=4.4, tile_cap=4,
                     sort_interval_steps=0, tiled_collide="pallas",
                     tiled_relocate="jnp", **kw)


def _collide(cfg, pos, radii):
    from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas
    st = tiled.init_tiles(cfg, pos, radii)
    out = jax.jit(lambda s, c=cfg: collide_pallas(s, c))(st)
    return np.asarray(out.x), np.asarray(out.y), np.asarray(out.pid)


def test_newton_collide_matches_standard_multiband():
    """Same pair set as the 9-offset sweep across band seams: positions
    agree to f32 rounding on a scene spanning 4 bands."""
    pos, radii = _scene(1500, 1)
    for uniform in (False, True):
        ref = _collide(_cfg(1500, tiled_newton=False,
                            tiled_uniform_radius=uniform), pos, radii)
        new = _collide(_cfg(1500, tiled_newton=True,
                            tiled_uniform_radius=uniform), pos, radii)
        assert (new[2] == ref[2]).all()
        dx = np.abs(new[0] - ref[0]).max()
        dy = np.abs(new[1] - ref[1]).max()
        assert dx < 1e-5 and dy < 1e-5, (uniform, dx, dy)


def test_newton_seam_pair_is_symmetric():
    """Two overlapping particles whose tiles sit EXACTLY on a band seam
    (global rows 7/8 -> the reaction must ride the scratch carry): both
    move apart by equal amounts, none is dropped or double-pushed."""
    cfg = _cfg(2)
    t, TY, TX = tiled.tile_geometry(cfg)
    assert TY >= 16, "geometry must span >= 2 bands for this test"
    # tile row k holds world y in [(k-1)*t, k*t); rows 7 and 8 straddle
    # the first band seam.  Place the pair overlapping across y = 7*t.
    yb = 7.0 * t
    pos = np.array([[5.0, yb - 0.3], [5.0, yb + 0.3]], np.float32)
    radii = np.full(2, 0.5, np.float32)
    x, y, pid = _collide(cfg, pos, radii)
    occ = pid >= 0
    ys = np.sort(y[occ].ravel())
    assert occ.sum() == 2
    d0 = 0.6
    dn = ys[-1] - ys[0]
    assert dn > d0 + 1e-4, (d0, dn)  # pushed apart
    # symmetric halves: the pair's center did not move
    assert abs((ys[0] + ys[-1]) / 2.0 - yb) < 1e-5
    # cross-check vs the standard sweep
    cfg0 = _cfg(2, tiled_newton=False)
    x0, y0, pid0 = _collide(cfg0, pos, radii)
    assert np.abs(np.sort(y0[pid0 >= 0].ravel()) - ys).max() < 1e-6


def test_newton_general_radius_asymmetric_split():
    """Mixed radii: the reaction is scaled by the inverse-mass split
    (wi = r_other / rsum), so the smaller particle moves further —
    matching the standard kernel's split to f32 rounding."""
    cfg = _cfg(2)
    pos = np.array([[5.0, 30.0], [5.6, 30.0]], np.float32)
    radii = np.array([0.5, 0.25], np.float32)
    x, y, pid = _collide(cfg, pos, radii)
    x0, y0, pid0 = _collide(_cfg(2, tiled_newton=False), pos, radii)
    occ = pid >= 0
    assert np.abs(np.sort(x[occ].ravel())
                  - np.sort(x0[pid0 >= 0].ravel())).max() < 1e-6
    # the r=0.25 particle (initially right) moved more than the r=0.5 one
    got_x = {int(p): float(v) for p, v in zip(pid[occ], x[occ])}
    d_big = abs(got_x[0] - 5.0)
    d_small = abs(got_x[1] - 5.6)
    assert d_small > d_big * 1.5, (d_big, d_small)


def test_newton_fused_substep_matches_standard():
    """Fused collide+integrate under newton: x/y/px/py all agree with the
    standard fused kernel to f32 rounding; world clamp intact."""
    from gpu_physics_engine_tpu.ops.tiled import StepParams
    from gpu_physics_engine_tpu.ops.tiled_pallas import (
        collide_integrate_pallas)
    pos, radii = _scene(1200, 2)
    params = StepParams(dt=jnp.float32(0.02), mouse_x=jnp.float32(0.0),
                        mouse_y=jnp.float32(0.0),
                        mouse_pressed=jnp.float32(0.0))
    outs = {}
    for newton in (False, True):
        cfg = _cfg(1200, tiled_newton=newton, tiled_uniform_radius=True)
        st = tiled.init_tiles(cfg, pos, radii)
        outs[newton] = jax.jit(lambda s, p, c=cfg: collide_integrate_pallas(
            s, p, c))(st, params)
    for f in ("x", "y", "px", "py"):
        d = np.abs(np.asarray(getattr(outs[True], f))
                   - np.asarray(getattr(outs[False], f))).max()
        assert d < 1e-5, (f, d)
    occ = np.asarray(outs[True].pid) >= 0
    assert np.asarray(outs[True].x)[occ].min() >= 0.5 - 1e-6


def test_newton_engine_runs_and_tracks_standard():
    """TiledEngine end-to-end: finite, tracks the standard engine over a
    short window, identical overflow accounting."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    engs = {}
    for newton in (False, True):
        e = TiledEngine(_cfg(256, h=30.0, tiled_newton=newton), seed=3)
        s = e.run(3)
        engs[newton] = (np.asarray(s.x), np.asarray(s.y),
                        int(s.overflow_count))
    dx = np.abs(engs[True][0] - engs[False][0]).max()
    assert np.isfinite(engs[True][0]).all()
    assert dx < 1e-3, dx  # rounding differences compound over 3 steps
    assert engs[True][2] == engs[False][2]
