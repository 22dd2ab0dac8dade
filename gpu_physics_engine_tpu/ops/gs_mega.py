"""All four GS color passes in ONE Pallas kernel (gs_colors_mega).

The per-color solve/apply kernels of gs_layout="par" are ~80%
HBM-traffic-bound (PERF.md phase profile: 4 colors = 4.75 ms @1M cap5
vs a ~4 ms pure-traffic floor): every color re-reads the x/y sub-grids
of all four parities at 3x band amplification and round-trips ux/uy
through HBM.  This kernel reads everything ONCE per grid block into
VMEM windows with an 8-sub-row halo and runs the full ordered
color-1..4 sweep chain in registers:

  - window = B2 + 2*HALO sub-rows, DMA'd from HBM (inputs are
    memory_space=ANY; pl.BlockSpec cannot express overlapping blocks).
    HALO = 8 is exact: each color contaminates <= 2 sub-rows per
    window edge (solve view roll 1 + apply view roll 1), 4 colors = 8,
    so the B2 mid rows equal the sequential per-color kernels BITWISE.
    Edge blocks clamp the window into [0, R): rows beyond the grid do
    not exist physically, so clamping loses nothing (the world border
    ring is the dependency boundary).
  - tables (src/rpid, born in rank_parity) are DATA — valid at every
    window row, no halo growth.
  - per color: resolve members from src codes over cross-parity window
    views (pltpu.roll row/lane shifts — identical values to the
    banded _rows3 views), ordered _sweep, then the pull-apply updates
    the x/y windows of all four parities in registers.
  - the substep's Verlet integration is fused at the end (mid rows
    only) when requested — same op order as ops/tiled.integrate.

Uniform-radius only (r0 compile-time; the production GS path).
TPU-only: the window DMAs have no interpret-mode story here — CPU
bit-coverage stays on the sequential kernels, and the mega kernel is
hardware-xchecked bit-exact against them (scripts/tpu_probe_gs_mega.py).

Cites: reference semantics = collision_solver.wgsl:26-118 (ordered
in-cell sweeps under the 4-color schedule); this kernel changes the
blocking, not one arithmetic op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.gs_pallas import (_PARS, _OFFS, _dec_off,
                                                  _lane, _mx_parity,
                                                  _sds, _sweep)

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=124 * (1 << 20))

HALO = 8  # sub-rows of window halo per edge (exact, see module doc)


def _pick_b2(R: int) -> int:
    """Largest 8-multiple block depth <= 64 dividing R (R is a multiple
    of 8 by the parity layout; production grids are multiples of 128)."""
    for b in (64, 56, 48, 40, 32, 24, 16, 8):
        if b <= R and R % b == 0:
            return b
    return R


def _rowroll(a, oy: int):
    if oy == 0:
        return a
    return pltpu.roll(a, shift=(-oy) % a.shape[1], axis=1)


def _wview(win_by_par, pa: int, pb: int, dy: int, dx: int):
    """Window view of the full-space (dy, dx) neighbor of a
    parity-(pa, pb) cell — the window analog of _par_views."""
    qa, qb = (pa + dy) & 1, (pb + dx) & 1
    oy = _dec_off(pa, dy, qa)
    ox = _dec_off(pb, dx, qb)
    return _lane(_rowroll(win_by_par[(qa, qb)], oy), ox)


def _mega_kernel(one_ref, par_ref, *refs, cap: int, K: int,
                 stiffness: float, r0: float, R: int, B2: int, DX: int,
                 integ: bool, dt_scale: float, gravity, mouse_strength,
                 world_w, world_h):
    W = B2 + 2 * HALO
    nin = 20 + (8 if integ else 0)   # x,y,pid,src,rpid x 4 par (+px,py)
    nout = (16 if integ else 8)      # x,y(,px,py) x 4 par
    hbm_in = refs[:nin]
    hbm_out = refs[nin:nin + nout]
    scr = refs[nin + nout:-2]
    sem_in, sem_out = refs[-2], refs[-1]

    i = pl.program_id(0)
    start = jnp.clip(i * B2 - HALO, 0, R - W)
    m0 = i * B2 - start  # 0 (first block) / HALO / 2*HALO (last block)

    # ---- DMA in: windows for x/y/pid/src/rpid, mid rows for px/py ----
    dmas = []
    for j in range(nin):
        rows = B2 if (integ and j >= 20) else W
        off = start if rows == W else i * B2
        d = pltpu.make_async_copy(
            hbm_in[j].at[:, pl.ds(off, rows), :], scr[j], sem_in.at[j])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()

    X = {p: scr[0 + k][...] for k, p in enumerate(_PARS)}
    Y = {p: scr[4 + k][...] for k, p in enumerate(_PARS)}
    PID = {p: scr[8 + k][...] for k, p in enumerate(_PARS)}
    SRC = {p: scr[12 + k][...] for k, p in enumerate(_PARS)}
    RPID = {p: scr[16 + k][...] for k, p in enumerate(_PARS)}

    one = one_ref[0]
    shape1 = (1, W, DX)

    for color in (1, 2, 3, 4):
        ac, bc = _mx_parity(color)
        src_v = SRC[(ac, bc)]
        rpid_v = RPID[(ac, bc)]

        # ---- solve: resolve members from src codes + ordered sweep
        # (identical math to gs_pallas._solve_dec_kernel) ----
        vx = [_wview(X, ac, bc, dy, dx) for (dy, dx) in _OFFS]
        vy = [_wview(Y, ac, bc, dy, dx) for (dy, dx) in _OFFS]
        lx, ly, lr, lpid = [], [], [], []
        for q in range(K):
            code_q = src_v[q:q + 1]
            xq = jnp.zeros(shape1, jnp.float32)
            yq = jnp.zeros(shape1, jnp.float32)
            for j in range(9):
                for s in range(cap):
                    hitq = code_q == j * cap + s
                    xq = jnp.where(hitq, vx[j][s:s + 1], xq)
                    yq = jnp.where(hitq, vy[j][s:s + 1], yq)
            lx.append(xq)
            ly.append(yq)
            lr.append(None)
            lpid.append(rpid_v[q:q + 1])
        active = jnp.full(shape1, True)
        lx, ly = _sweep(lx, ly, lr, lpid, active,
                        jnp.float32(stiffness), one, r0=r0)
        ux = jnp.concatenate(lx, axis=0)
        uy = jnp.concatenate(ly, axis=0)

        # ---- apply: pull each particle's update from the one color
        # cell whose table names its pid (gs_pallas._apply_dec_kernel
        # over window views) ----
        for p_i, (pa, pb) in enumerate(_PARS):
            x_mid, y_mid, pid_mid = X[(pa, pb)], Y[(pa, pb)], PID[(pa, pb)]
            dys = [0] if pa == ac else [-1, 1]
            dxs = [0] if pb == bc else [-1, 1]
            cells = []
            for dy in dys:
                for dx in dxs:
                    oy = _dec_off(pa, dy, ac)
                    ox = _dec_off(pb, dx, bc)
                    cells.append((_lane(_rowroll(ux, oy), ox),
                                  _lane(_rowroll(uy, oy), ox),
                                  _lane(_rowroll(rpid_v, oy), ox)))
            newx = [x_mid[k:k + 1] for k in range(cap)]
            newy = [y_mid[k:k + 1] for k in range(cap)]
            for k in range(cap):
                mypid = pid_mid[k:k + 1]
                occ = mypid >= 0
                for ux_c, uy_c, rp_c in cells:
                    for q in range(K):
                        hit = occ & (rp_c[q:q + 1] == mypid)
                        newx[k] = jnp.where(hit, ux_c[q:q + 1], newx[k])
                        newy[k] = jnp.where(hit, uy_c[q:q + 1], newy[k])
            X[(pa, pb)] = jnp.concatenate(newx, axis=0)
            Y[(pa, pb)] = jnp.concatenate(newy, axis=0)

    # ---- output mid rows (select-of-3 window alignment) + optional
    # fused Verlet (ops/tiled.integrate op order, uniform radius) ----
    def mid(a):
        lo = a[:, 0:B2]
        md = a[:, HALO:HALO + B2]
        hi = a[:, 2 * HALO:2 * HALO + B2]
        return jnp.where(m0 == 0, lo, jnp.where(m0 == HALO, md, hi))

    if integ:
        dt = par_ref[0] * jnp.float32(dt_scale)
        dt2 = dt * dt
        mx, my = par_ref[1], par_ref[2]
        strength = jnp.float32(mouse_strength) * par_ref[3]
        gx = jnp.float32(gravity[0])
        gy = jnp.float32(gravity[1])
        r0c = jnp.float32(r0)
        wxc = jnp.float32(world_w) - r0c
        wyc = jnp.float32(world_h) - r0c

    out_dmas = []
    for p_i, p in enumerate(_PARS):
        xm = mid(X[p])
        ym = mid(Y[p])
        if not integ:
            scr_x = scr[nin + 2 * p_i]
            scr_y = scr[nin + 2 * p_i + 1]
            scr_x[...] = xm
            scr_y[...] = ym
            for j, s in ((2 * p_i, scr_x), (2 * p_i + 1, scr_y)):
                d = pltpu.make_async_copy(
                    s, hbm_out[j].at[:, pl.ds(i * B2, B2), :],
                    sem_out.at[j])
                d.start()
                out_dmas.append(d)
            continue
        pidm = mid(PID[p])
        occ = pidm >= 0
        pxm = scr[20 + p_i][...]
        pym = scr[24 + p_i][...]
        vel_x = xm - pxm
        vel_y = ym - pym
        dxm = mx - xm
        dym = my - ym
        dist = jnp.sqrt(dxm * dxm + dym * dym)
        inv = jnp.where(dist > 1e-6, 1.0 / jnp.maximum(dist, 1e-6), 0.0)
        axk = gx + dxm * inv * strength
        ayk = gy + dym * inv * strength
        nx = xm + vel_x + axk * dt2
        ny = ym + vel_y + ayk * dt2
        nx = jnp.clip(nx, r0c, wxc)
        ny = jnp.clip(ny, r0c, wyc)
        scr_x = scr[nin + 4 * p_i]
        scr_y = scr[nin + 4 * p_i + 1]
        scr_px = scr[nin + 4 * p_i + 2]
        scr_py = scr[nin + 4 * p_i + 3]
        scr_x[...] = jnp.where(occ, nx, xm)
        scr_y[...] = jnp.where(occ, ny, ym)
        scr_px[...] = jnp.where(occ, xm, pxm)
        scr_py[...] = jnp.where(occ, ym, pym)
        for j, s in ((4 * p_i, scr_x), (4 * p_i + 1, scr_y),
                     (4 * p_i + 2, scr_px), (4 * p_i + 3, scr_py)):
            d = pltpu.make_async_copy(
                s, hbm_out[j].at[:, pl.ds(i * B2, B2), :], sem_out.at[j])
            d.start()
            out_dmas.append(d)
    for d in out_dmas:
        d.wait()


def colors_mega(subs, tables, one, config: SimConfig, cap: int, K: int,
                integ=None):
    """Run the full 4-color ordered GS sweep chain in one kernel pass.

    ``subs`` = parity sub-grids (uniform layout, no radius planes),
    ``tables`` = rank_parity output {parity: (src, rpid, None)},
    ``integ`` = (StepParams, dt_scale) to fuse the substep's Verlet.
    Returns updated subs dict (x, y[, px, py] replaced)."""
    r0 = config.initial_radius
    R, DX = subs["x"][(0, 0)].shape[1:]
    B2 = _pick_b2(R)
    W = B2 + 2 * HALO
    assert R >= W, "grid too small for the mega window; use the" \
        " sequential color kernels"
    nb = R // B2
    do_integ = integ is not None
    dt_scale = integ[1] if do_integ else 1.0

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    nin = 20 + (8 if do_integ else 0)
    nout = 16 if do_integ else 8

    scratch = (
        [pltpu.VMEM((cap, W, DX), jnp.float32) for _ in range(8)]     # x,y
        + [pltpu.VMEM((cap, W, DX), jnp.int32) for _ in range(4)]     # pid
        + [pltpu.VMEM((K, W, DX), jnp.int32) for _ in range(8)]       # tables
        + ([pltpu.VMEM((cap, B2, DX), jnp.float32) for _ in range(8)]
           if do_integ else [])                                        # px,py
        + [pltpu.VMEM((cap, B2, DX), jnp.float32) for _ in range(nout)]
        + [pltpu.SemaphoreType.DMA((nin,)), pltpu.SemaphoreType.DMA((nout,))]
    )

    if do_integ:
        params = integ[0]
        pvec = jnp.stack([params.dt, params.mouse_x, params.mouse_y,
                          params.mouse_pressed]).astype(jnp.float32)
    else:
        pvec = jnp.zeros((4,), jnp.float32)

    ins = ([subs["x"][p] for p in _PARS] + [subs["y"][p] for p in _PARS]
           + [subs["pid"][p] for p in _PARS]
           + [tables[p][0] for p in _PARS] + [tables[p][1] for p in _PARS]
           + ([subs["px"][p] for p in _PARS]
              + [subs["py"][p] for p in _PARS] if do_integ else []))

    out_shape = tuple(_sds((cap, R, DX), jnp.float32)
                      for _ in range(nout))

    outs = pl.pallas_call(
        partial(_mega_kernel, cap=cap, K=K, stiffness=config.stiffness,
                r0=r0, R=R, B2=B2, DX=DX, integ=do_integ,
                dt_scale=dt_scale, gravity=tuple(config.gravity),
                mouse_strength=config.mouse_strength,
                world_w=config.world_width, world_h=config.world_height),
        grid=(nb,),
        in_specs=[smem, smem] + [any_spec] * nin,
        out_specs=tuple([any_spec] * nout),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_VMEM,
    )(one, pvec, *ins)

    new = {n: dict(subs[n]) for n in subs}
    step = 4 if do_integ else 2
    for p_i, p in enumerate(_PARS):
        new["x"][p] = outs[step * p_i]
        new["y"][p] = outs[step * p_i + 1]
        if do_integ:
            new["px"][p] = outs[step * p_i + 2]
            new["py"][p] = outs[step * p_i + 3]
    return new
