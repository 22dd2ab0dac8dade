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


_B2_BUDGET = 60 * (1 << 20)  # scratch budget under the 128 MB vmem
# limit.  Generous-looking headroom is NOT slack: Mosaic's register
# allocator spills scale with the window size (measured 52.6M of spill
# slots at W=80/cap5/K6 — total 140M, OOM; the scheduler overlaps the
# four parities' independent tails), so the budget must leave room for
# ~0.9x the scratch bill in spills + live values.


def _pick_b2_vmem(R: int, DX: int, cap: int, K: int, integ: bool) -> int:
    """Largest block depth whose scratch bill fits _B2_BUDGET — window
    planes (x, y, pid, 2 tables per parity), px/py mid inputs, and the
    mid out buffers all scale with W = B2 + 2*HALO; measured OOM at
    166M/128M when cap5/K6 ran with B2=64 AND the register allocator
    spilled (the spills are fixed by the streaming loop order below,
    the bill is capped here)."""
    for b in (64, 56, 48, 40, 32, 24, 16, 8):
        if b > R or R % b:
            continue
        W = b + 2 * HALO
        if R < W:
            continue
        planes = 3 * cap + 2 * K           # x,y,pid + src,rpid per parity
        byt = 4 * planes * W * DX * 4
        nout = 16 if integ else 8
        if integ:
            byt += 8 * cap * b * DX * 4    # px,py mid inputs
        byt += nout * cap * b * DX * 4     # out mid buffers
        if byt <= _B2_BUDGET:
            return b
    return 8 if R % 8 == 0 else R


def _pick_b2_reloc(R: int, DX: int, cap: int, nf: int) -> int:
    """relocate_mega's block depth: field+plan windows, out mids, and
    the matching cores' live bool set (claims/claimed, 2*8*cap planes)
    must fit the budget."""
    for b in (64, 56, 48, 40, 32, 24, 16, 8):
        if b > R or R % b:
            continue
        W = b + 16
        if R < W:
            continue
        byt = 4 * (nf + 1) * cap * W * DX * 4        # windows + plans
        byt += 4 * (nf * cap + 1) * b * DX * 4       # out mids + defer
        byt += (2 * 8 * cap + 3 * cap) * W * DX * 4  # matching live set
        if byt <= _B2_BUDGET:
            return b
    return 8 if R % 8 == 0 else R


def _rowroll(a, oy: int):
    if oy == 0:
        return a
    return pltpu.roll(a, shift=(-oy) % a.shape[1], axis=1)


class _PlaneView:
    """Sliceable lazy window view: ``v[s:s+1]`` loads ONE plane from the
    scratch ref and applies the (row, lane) roll on demand.  The shared
    matching cores (_plan_choose / _apply_merge) only ever slice single
    planes from their views, so handing them these keeps the live set at
    a few planes — materializing 9 neighbors x all fields of full rolled
    windows spilled the register allocator to vmem (see _mega_kernel)."""
    __slots__ = ("ref", "oy", "ox")

    def __init__(self, ref, oy: int, ox: int):
        self.ref, self.oy, self.ox = ref, oy, ox

    def __getitem__(self, sl):
        return _lane(_rowroll(self.ref[sl], self.oy), self.ox)


def _par_off(pa: int, pb: int, ey: int, ex: int):
    """((qa, qb), oy, ox): neighbor parity + decimated roll offsets of
    the full-space (ey, ex) neighbor of a parity-(pa, pb) cell."""
    qa, qb = (pa + ey) & 1, (pb + ex) & 1
    return (qa, qb), _dec_off(pa, ey, qa), _dec_off(pb, ex, qb)


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
    # row offsets expressed as 8*k so Mosaic can PROVE sublane-tiling
    # divisibility of the dynamic DMA slices (B2/HALO/R/W are all
    # 8-multiples; a bare clip defeats the prover)
    start = 8 * jnp.clip(i * (B2 // 8) - HALO // 8, 0, (R - W) // 8)
    mid_off = 8 * (i * (B2 // 8))
    m0 = mid_off - start  # 0 (first block) / HALO / 2*HALO (last block)

    # ---- DMA in: windows for x/y/pid/src/rpid, mid rows for px/py ----
    dmas = []
    for j in range(nin):
        rows = B2 if (integ and j >= 20) else W
        off = start if rows == W else mid_off
        d = pltpu.make_async_copy(
            hbm_in[j].at[:, pl.ds(off, rows), :], scr[j], sem_in.at[j])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()

    # state STAYS in the VMEM scratch refs and is re-read per color:
    # carrying all windows as live VALUES across the 4-color chain
    # spills ~160 MB of registers to vmem (measured OOM at 248M); with
    # in-place updates only one color's working set is live at a time.
    xref = {p: scr[0 + k] for k, p in enumerate(_PARS)}
    yref = {p: scr[4 + k] for k, p in enumerate(_PARS)}
    pidref = {p: scr[8 + k] for k, p in enumerate(_PARS)}
    srcref = {p: scr[12 + k] for k, p in enumerate(_PARS)}
    rpidref = {p: scr[16 + k] for k, p in enumerate(_PARS)}

    one = one_ref[0]
    shape1 = (1, W, DX)

    for color in (1, 2, 3, 4):
        ac, bc = _mx_parity(color)
        src_v = srcref[(ac, bc)][...]
        rpid_v = rpidref[(ac, bc)][...]

        # ---- solve: resolve members from src codes + ordered sweep
        # (identical math to gs_pallas._solve_dec_kernel).  Loop order
        # (j, s) OUTER / q inner streams one rolled plane at a time;
        # materializing all 18 rolled windows at once spilled ~79 MB of
        # registers to vmem (measured OOM, 166M/128M).  The where-chain
        # per q still applies in (j, s) order — bit-identical selection.
        lx = [jnp.zeros(shape1, jnp.float32) for _ in range(K)]
        ly = [jnp.zeros(shape1, jnp.float32) for _ in range(K)]
        for j, (dy, dxo) in enumerate(_OFFS):
            qa, qb = (ac + dy) & 1, (bc + dxo) & 1
            oy = _dec_off(ac, dy, qa)
            ox = _dec_off(bc, dxo, qb)
            for s in range(cap):
                vxs = _lane(_rowroll(xref[(qa, qb)][s:s + 1], oy), ox)
                vys = _lane(_rowroll(yref[(qa, qb)][s:s + 1], oy), ox)
                code = j * cap + s
                for q in range(K):
                    hitq = src_v[q:q + 1] == code
                    lx[q] = jnp.where(hitq, vxs, lx[q])
                    ly[q] = jnp.where(hitq, vys, ly[q])
        lr = [None] * K
        lpid = [rpid_v[q:q + 1] for q in range(K)]
        active = jnp.full(shape1, True)
        lx, ly = _sweep(lx, ly, lr, lpid, active,
                        jnp.float32(stiffness), one, r0=r0)

        # ---- apply: pull each particle's update from the one color
        # cell whose table names its pid (gs_pallas._apply_dec_kernel
        # over window views).  (off, q) outer / k inner: one rolled
        # (rpid, ux, uy) triple live at a time; per-k where order is
        # unchanged, so the chain is bit-identical ----
        for (pa, pb) in _PARS:
            mypid = [pidref[(pa, pb)][k:k + 1] for k in range(cap)]
            newx = [xref[(pa, pb)][k:k + 1] for k in range(cap)]
            newy = [yref[(pa, pb)][k:k + 1] for k in range(cap)]
            dys = [0] if pa == ac else [-1, 1]
            dxs = [0] if pb == bc else [-1, 1]
            for dy in dys:
                for dxo in dxs:
                    oy = _dec_off(pa, dy, ac)
                    ox = _dec_off(pb, dxo, bc)
                    for q in range(K):
                        rp = _lane(_rowroll(rpid_v[q:q + 1], oy), ox)
                        uxq = _lane(_rowroll(lx[q], oy), ox)
                        uyq = _lane(_rowroll(ly[q], oy), ox)
                        for k in range(cap):
                            hit = (mypid[k] >= 0) & (rp == mypid[k])
                            newx[k] = jnp.where(hit, uxq, newx[k])
                            newy[k] = jnp.where(hit, uyq, newy[k])
            # in-place: the apply writes only this parity's planes and
            # reads only the color's ux/uy/rpid + own mids, so parities
            # are independent; the NEXT color re-reads the refs
            for k in range(cap):
                xref[(pa, pb)][k:k + 1] = newx[k]
                yref[(pa, pb)][k:k + 1] = newy[k]

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
        xm = mid(xref[p][...])
        ym = mid(yref[p][...])
        if not integ:
            scr_x = scr[nin + 2 * p_i]
            scr_y = scr[nin + 2 * p_i + 1]
            scr_x[...] = xm
            scr_y[...] = ym
            for j, s in ((2 * p_i, scr_x), (2 * p_i + 1, scr_y)):
                d = pltpu.make_async_copy(
                    s, hbm_out[j].at[:, pl.ds(mid_off, B2), :],
                    sem_out.at[j])
                d.start()
                out_dmas.append(d)
            continue
        pidm = mid(pidref[p][...])
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
                s, hbm_out[j].at[:, pl.ds(mid_off, B2), :], sem_out.at[j])
            d.start()
            out_dmas.append(d)
    for d in out_dmas:
        d.wait()


def _reloc_mega_kernel(*refs, cap: int, t: float, gTY: int, gTX: int,
                       match: str, delta: float, R: int, B2: int,
                       DX: int, flds):
    """Relocate plan + apply in ONE window pass: plans computed for the
    whole window in registers (no HBM round trip, no separate plan-pass
    reads), then the pull-apply on the mid rows.  Validity: plan needs
    field views +-1 row, apply needs plan views +-1 — mid rows are
    exact with 2 halo rows; RH=8 for sublane-tile alignment
    of the window DMAs.  Math cores shared
    with the sequential kernels (_plan_choose / _apply_merge /
    _step_offsets) — identical matching, bit-identical storage."""
    from gpu_physics_engine_tpu.ops.tiled_pallas import (_NEIGHBORS,
                                                         _apply_merge,
                                                         _plan_choose,
                                                         _step_offsets)
    RH = 8  # relocate halo (sublane-tile-aligned; 2 rows suffice)
    W = B2 + 2 * RH
    nf = len(flds)
    nin = 4 * nf
    nout = 4 * (nf + 1)  # fields + defer plane per parity
    hbm_in = refs[:nin]
    hbm_out = refs[nin:nin + nout]
    scr = refs[nin + nout:-2]
    sem_in, sem_out = refs[-2], refs[-1]

    i = pl.program_id(0)
    # 8*k offsets: Mosaic must PROVE sublane-tile divisibility of the
    # dynamic DMA row slices (see _mega_kernel)
    start = 8 * jnp.clip(i * (B2 // 8) - RH // 8, 0, (R - W) // 8)
    mid_off = 8 * (i * (B2 // 8))
    m0 = mid_off - start  # 0 / RH / 2*RH

    dmas = []
    for j in range(nin):
        d = pltpu.make_async_copy(
            hbm_in[j].at[:, pl.ds(start, W), :], scr[j], sem_in.at[j])
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()

    # state stays in VMEM scratch refs, sliced ONE PLANE at a time via
    # _PlaneView — materializing the windows/views as live VALUES spills
    # the register allocator to vmem (see _mega_kernel); plans land in
    # their own scratch refs (the last 4 entries before the out
    # scratches)
    fref = {n: {p: scr[4 * f_i + k] for k, p in enumerate(_PARS)}
            for f_i, n in enumerate(flds)}
    planref = {p: scr[nin + k] for k, p in enumerate(_PARS)}

    riota = jax.lax.broadcasted_iota(jnp.int32, (1, W, DX), 1)
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, W, DX), 2)

    # ---- plan for every window row, all four parities ----
    for (pa, pb) in _PARS:
        ty = 2 * (start + riota) + pa
        tx = 2 * liota + pb
        views = []
        for (ey, ex) in _NEIGHBORS:
            q, oy, ox = _par_off(pa, pb, ey, ex)
            vx = _PlaneView(fref["x"][q], oy, ox)
            vy = _PlaneView(fref["y"][q], oy, ox)
            vp = _PlaneView(fref["pid"][q], oy, ox)
            valid_e = ((ty + ey >= 0) & (ty + ey <= gTY - 1)
                       & (tx + ex >= 0) & (tx + ex <= gTX - 1))
            views.append((vx, vy, vp, valid_e, ey, ex))
        pid_ref = fref["pid"][(pa, pb)]
        chosen = _plan_choose(views, pid_ref, ty, tx,
                              cap=cap, t=t, gTY=gTY, gTX=gTX,
                              match=match, delta=delta)
        interior = ((ty >= 1) & (ty <= gTY - 2)
                    & (tx >= 1) & (tx <= gTX - 2))
        for k in range(cap):
            free_k = pid_ref[k:k + 1] < 0
            planref[(pa, pb)][k:k + 1] = jnp.where(
                free_k & interior, chosen[k], -1)

    # ---- apply on the window (mid rows exact) ----
    out_dmas = []
    for p_i, (pa, pb) in enumerate(_PARS):
        my = {n: fref[n][(pa, pb)] for n in flds}
        my["plan"] = planref[(pa, pb)]
        ty = 2 * (start + riota) + pa
        tx = 2 * liota + pb
        dty, dtx, moving = [], [], []
        for k in range(cap):
            oy_k, ox_k = _step_offsets(my["x"][k:k + 1],
                                       my["y"][k:k + 1],
                                       ty, tx, t=t, delta=delta,
                                       gTY=gTY, gTX=gTX)
            dty.append(oy_k)
            dtx.append(ox_k)
            in_grid = ((ty + dty[k] >= 0) & (ty + dty[k] <= gTY - 1))
            moving.append((my["pid"][k:k + 1] >= 0) & in_grid
                          & ((dty[k] != 0) | (dtx[k] != 0)))
        nbr_views = []
        for (ey, ex) in _NEIGHBORS:
            q, oy, ox = _par_off(pa, pb, ey, ex)
            fv = {n: _PlaneView(fref[n][q], oy, ox) for n in flds}
            pv = _PlaneView(planref[q], oy, ox)
            nbr_views.append((fv, pv, ey, ex))
        out, defer = _apply_merge(my, nbr_views, moving, dty, dtx,
                                  cap=cap, match=match, fields=flds)

        def midw(a, W=W):
            lo = a[:, 0:B2]
            md = a[:, RH:RH + B2]
            hi = a[:, 2 * RH:2 * RH + B2]
            return jnp.where(m0 == 0, lo,
                             jnp.where(m0 == RH, md, hi))

        no = nf + 1
        for f_i, n in enumerate(flds):
            s = scr[nin + 4 + no * p_i + f_i]
            for k in range(cap):   # per-plane: no (cap, W, DX) concat
                s[k:k + 1] = midw(out[n][k])
            d = pltpu.make_async_copy(
                s, hbm_out[no * p_i + f_i].at[:, pl.ds(mid_off, B2), :],
                sem_out.at[no * p_i + f_i])
            d.start()
            out_dmas.append(d)
        sdef = scr[nin + 4 + no * p_i + nf]
        sdef[...] = midw(defer)[0]
        d = pltpu.make_async_copy(
            sdef, hbm_out[no * p_i + nf].at[pl.ds(mid_off, B2), :],
            sem_out.at[no * p_i + nf])
        d.start()
        out_dmas.append(d)
    for d in out_dmas:
        d.wait()


def relocate_mega(subs, config: SimConfig, cap: int, t: float,
                  gTY: int, gTX: int, flds):
    """One window-fused pull-relocate pass (plan + apply).  Returns
    (updated subs, deferred-mover count) like relocate_parity."""
    match = config.tiled_match
    if match == "auto":
        match = "greedy" if (gTY * gTX <= 800_000 and cap <= 8) else "flip2"
    delta = config.hysteresis_delta
    R, DX = subs["x"][(0, 0)].shape[1:]
    B2 = _pick_b2_reloc(R, DX, cap, len(flds))
    RH = 8
    W = B2 + 2 * RH
    assert R >= W
    nb = R // B2
    nf = len(flds)
    nin = 4 * nf
    nout = 4 * (nf + 1)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    scratch = (
        [pltpu.VMEM((cap, W, DX),
                    jnp.int32 if n == "pid" else jnp.float32)
         for n in flds for _ in range(4)]
        + [pltpu.VMEM((cap, W, DX), jnp.int32) for _ in range(4)]  # plans
        + [pltpu.VMEM((cap, B2, DX),
                      jnp.int32 if n == "pid" else jnp.float32)
           if n != "defer" else pltpu.VMEM((B2, DX), jnp.int32)
           for _ in range(4) for n in tuple(flds) + ("defer",)]
        + [pltpu.SemaphoreType.DMA((nin,)),
           pltpu.SemaphoreType.DMA((nout,))]
    )

    ins = [subs[n][p] for n in flds for p in _PARS]
    out_shape = tuple(
        _sds((cap, R, DX), jnp.int32 if n == "pid" else jnp.float32)
        if n != "defer" else _sds((R, DX), jnp.int32)
        for _ in range(4) for n in tuple(flds) + ("defer",))

    outs = pl.pallas_call(
        partial(_reloc_mega_kernel, cap=cap, t=t, gTY=gTY, gTX=gTX,
                match=match, delta=delta, R=R, B2=B2, DX=DX,
                flds=tuple(flds)),
        grid=(nb,),
        in_specs=[any_spec] * nin,
        out_specs=tuple([any_spec] * nout),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_VMEM,
    )(*ins)

    new_subs = {n: {} for n in flds}
    defer_total = jnp.int32(0)
    no = nf + 1
    for p_i, p in enumerate(_PARS):
        for f_i, n in enumerate(flds):
            new_subs[n][p] = outs[no * p_i + f_i]
        defer_total = defer_total + jnp.sum(outs[no * p_i + nf])
    return new_subs, defer_total


def colors_mega(subs, tables, one, config: SimConfig, cap: int, K: int,
                integ=None):
    """Run the full 4-color ordered GS sweep chain in one kernel pass.

    ``subs`` = parity sub-grids (uniform layout, no radius planes),
    ``tables`` = rank_parity output {parity: (src, rpid, None)},
    ``integ`` = (StepParams, dt_scale) to fuse the substep's Verlet.
    Returns updated subs dict (x, y[, px, py] replaced)."""
    r0 = config.initial_radius
    R, DX = subs["x"][(0, 0)].shape[1:]
    do_integ = integ is not None
    B2 = _pick_b2_vmem(R, DX, cap, K, do_integ)
    W = B2 + 2 * HALO
    assert R >= W, "grid too small for the mega window; use the" \
        " sequential color kernels"
    nb = R // B2
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
