"""Persistent parity-space Gauss-Seidel pipeline (gs_layout="par").

The "dec"/"mx" GS layouts (ops/gs_pallas.py) cut the solve 4x by running
each color pass on its own 2x2-decimated sub-grid, but pay a per-step
relayout between the full-space state and the sub-grids — measured
10.2 ms @1M for the x/y/pid round trip alone (mx matmuls; XLA strided
slices are ~13x worse), which erases the kernel win (PERF.md).  This
module removes the relayout from the step entirely by keeping the WHOLE
GS step in parity space:

  - state lives as four parity sub-grids per field (x, y, px, py, r,
    pid), using the mx convention sub[(pa, pb)][si, sj] =
    full[2*si + pa, 2*sj + pb] (the full grid's own border/pad tiles
    land on sub-grid edges and play the fill role — no explicit ring);
  - rank runs per parity with cross-parity neighbor views, producing
    the occupancy tables born-decomposed (kernel cores shared with the
    flat layout: ops/gs_pallas._member_streams_from_views + the
    minloop/net selectors — bit-identical selection);
  - the color solve/apply are the existing dec kernels
    (ops/gs_pallas._solve_dec_kernel/_apply_dec_kernel), driven exactly
    like gs_solve_pallas_mx's color loop but with no relayout around;
  - the pull relocate runs per parity with cross-parity views (matching
    cores shared with the flat kernels: ops/tiled_pallas._plan_choose +
    _apply_merge — identical claim priority, so storage evolution is
    bit-identical to the flat relocate);
  - integrate is elementwise (ops/tiled.integrate on per-parity shims).

Full-space state crosses into parity space only at scan-chunk
boundaries (TiledEngine converts around each scanned run() window via
the bit-faithful mx one-hot-matmul relayout) — amortized over the
chunk depth, ~0.6 ms/step at chunk 32 vs ~10-16 ms/step for the
per-step relayout the mx layout pays.

Reference semantics parity: identical to gs_layout="flat"
(collision_solver.wgsl:26-118 ordered in-cell sweeps) — the oracle
tests assert bit-equality of trajectories on CPU.  Single-chip only
(tiled_solver="gs" already is, parallel/tiled_shard.py:109).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.gs_pallas import (
    _OFFS, _PARS, _apply_dec_kernel, _dec_off, _interpret,
    _member_streams_from_views, _mx_blocks, _mx_decompose,
    _mx_onehot, _mx_recompose, _mx_parity, _rank_minloop_select,
    _rank_net_select, _rows3, _sds, _solve_dec_kernel, _lane, BAND,
    _BIGPID)
from gpu_physics_engine_tpu.ops.tiled import (TileState, integrate,
                                              tile_geometry)
from gpu_physics_engine_tpu.ops.tiled_pallas import (_NEIGHBORS,
                                                     _apply_merge,
                                                     _plan_choose,
                                                     _step_offsets)

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))

def _fused(config: SimConfig) -> bool:
    """gs_par_fused tri-state: None = fused on real TPU only (the fused
    kernels' 4x-bigger programs hit CPU interpret's superlinear
    compile)."""
    if config.gs_par_fused is None:
        return jax.default_backend() == "tpu"
    return bool(config.gs_par_fused)

_F = ("x", "y", "px", "py", "r", "pid")
_FILL = {"x": 0.0, "y": 0.0, "px": 0.0, "py": 0.0, "r": 0.0, "pid": -1}


def _flds(config: SimConfig):
    """Parity-space field tuple.  Under tiled_uniform_radius the radius
    planes are DROPPED from parity space entirely: rank/solve use the
    compile-time r0, integrate rebuilds where(pid>=0, r0, 0) on the
    fly, and from_parity reconstructs the full-space plane the same way
    — bit-identical to carrying it, because the relocate apply's final
    compaction zero-fills every dead slot (tiled_pallas._apply_merge),
    so the stored plane IS that expression.  Saves the radius march
    through the per-step relocate (one 3x-amplified read + one write of
    cap planes per parity)."""
    return (("x", "y", "px", "py", "pid")
            if config.tiled_uniform_radius else _F)


# ---------------------------------------------------------------------------
# full-space <-> parity-space conversion (chunk boundaries only)
# ---------------------------------------------------------------------------

def to_parity(state: TileState, config: SimConfig):
    """TileState -> (subs, num_active, overflow_count) carry.  subs =
    {field: {parity: [cap, DYp, DX]}} in the mx convention."""
    _, TY, TX = state.dims
    by, bx = _mx_blocks(TY, TX)
    Ey, Ex = _mx_onehot(by), _mx_onehot(bx)
    sp = config.gs_mx_split
    arrs = dict(x=state.x, y=state.y, px=state.px, py=state.py,
                r=state.radius, pid=state.pid)
    subs = {n: _mx_decompose(arrs[n], TY, TX, _FILL[n], Ey, Ex, split=sp)
            for n in _flds(config)}
    return subs, state.num_active, state.overflow_count


def from_parity(carry, template: TileState, config: SimConfig) -> TileState:
    """Inverse of to_parity; ``template`` supplies shapes/geometry."""
    subs, num_active, overflow = carry
    _, TY, TX = template.dims
    by, bx = _mx_blocks(TY, TX)
    Ey, Ex = _mx_onehot(by), _mx_onehot(bx)
    sp = config.gs_mx_split
    out = {n: _mx_recompose(subs[n], TY, TX, template.pid.dtype
                            if n == "pid" else jnp.float32, Ey, Ex,
                            split=sp)
           for n in _flds(config)}
    if "r" not in out:  # uniform: reconstruct (see _flds)
        out["r"] = jnp.where(out["pid"] >= 0,
                             jnp.float32(config.initial_radius),
                             jnp.float32(0.0))
    return dataclasses.replace(
        template, x=out["x"], y=out["y"], px=out["px"], py=out["py"],
        radius=out["r"], pid=out["pid"], num_active=num_active,
        overflow_count=overflow)


def _coords(ref, pa: int, pb: int):
    """Full-space (ty, tx) of each lane's cell for a parity-(pa, pb)
    band block (mx convention: full = 2*sub + parity)."""
    band = ref.shape[1]
    shape1 = (1, band, ref.shape[2])
    si = (pl.program_id(0) * band
          + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    sj = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)
    return 2 * si + pa, 2 * sj + pb


def _par_views(rows_by_par, pa: int, pb: int, offs):
    """Cross-parity neighbor views for a parity-(pa, pb) cell: for each
    full-space offset in ``offs``, the matching (band row, lane roll)
    view over the other parities' band blocks (gs_pallas._dec_views
    generalized to any offset list)."""
    views = []
    for (dy, dx) in offs:
        qa, qb = (pa + dy) & 1, (pb + dx) & 1
        oy = _dec_off(pa, dy, qa)
        ox = _dec_off(pb, dx, qb)
        views.append(_lane(rows_by_par[(qa, qb)][oy + 1], ox))
    return views


# ---------------------------------------------------------------------------
# rank, per parity (tables born decomposed)
# ---------------------------------------------------------------------------

def _rank_kernel_par(one_ref, *refs, cap: int, K: int, t: float,
                     impl: str, pa: int, pb: int, gTY: int, gTX: int,
                     r0=None):
    # refs: x, y, [r,] pid; each 4 parities x (up, mid, dn); then outs.
    # r0 (uniform radius): the radius sub-grids are absent from the
    # call and no rrad table is produced.
    one = one_ref[0]
    nf = 3 if r0 is not None else 4
    rows = []
    for f in range(nf):
        base = 12 * f
        rows.append({p: _rows3(*(r[...] for r in
                                 refs[base + 3 * i:base + 3 * i + 3]))
                     for i, p in enumerate(_PARS)})
    if r0 is not None:
        xr, yr, pr = rows
        src_ref, rpid_ref, count_ref = refs[12 * nf:]
    else:
        xr, yr, rr, pr = rows
        src_ref, rpid_ref, rrad_ref, count_ref = refs[12 * nf:]

    ty, tx = _coords(refs[1], pa, pb)  # any mid block for shape
    field_rows = ((xr, yr, pr) if r0 is not None else (xr, yr, rr, pr))
    views = list(zip(*(_par_views(fr, pa, pb, _OFFS)
                       for fr in field_rows)))
    streams, count = _member_streams_from_views(one, views, ty, tx, cap,
                                                t, r0=r0)
    select = _rank_net_select if impl == "net" else _rank_minloop_select
    src_out, pid_out, rad_out = select(streams, count, K)

    # border/pad cells may see band-clamp garbage views — their tables
    # must stay fill so the apply's pid match never takes them (the flat
    # rank gets this for free: its border AABBs lie outside the world)
    interior = ((ty >= 1) & (ty <= gTY - 2) & (tx >= 1) & (tx <= gTX - 2))
    src_out = [jnp.where(interior, s, -1) for s in src_out]
    pid_out = [jnp.where(interior, q, _BIGPID) for q in pid_out]
    count = jnp.where(interior, count, 0)

    src_ref[...] = jnp.concatenate(src_out, axis=0)
    rpid_ref[...] = jnp.concatenate(pid_out, axis=0)
    if r0 is None:
        rad_out = [jnp.where(interior, rq, 0.0) for rq in rad_out]
        rrad_ref[...] = jnp.concatenate(rad_out, axis=0)
    count_ref[...] = count[0]


def _rank_kernel_par_all(one_ref, *refs, cap: int, K: int, t: float,
                         impl: str, gTY: int, gTX: int, r0=None):
    """All four parities' rank tables in ONE kernel pass: identical
    per-parity math to _rank_kernel_par, but the 48 (36 uniform) input
    blocks are read once instead of once per parity (4x less HBM
    traffic — the unfused parity rank re-reads every sub-grid from all
    four parity kernels on top of the 3x band amplification)."""
    one = one_ref[0]
    nf = 3 if r0 is not None else 4
    no = 3 if r0 is not None else 4
    rows = []
    for f in range(nf):
        base = 12 * f
        rows.append({p: _rows3(*(r[...] for r in
                                 refs[base + 3 * i:base + 3 * i + 3]))
                     for i, p in enumerate(_PARS)})
    outs = refs[12 * nf:]
    select = _rank_net_select if impl == "net" else _rank_minloop_select

    for pi, (pa, pb) in enumerate(_PARS):
        ty, tx = _coords(refs[1], pa, pb)
        views = list(zip(*(_par_views(fr, pa, pb, _OFFS)
                           for fr in rows)))
        streams, count = _member_streams_from_views(one, views, ty, tx,
                                                    cap, t, r0=r0)
        src_out, pid_out, rad_out = select(streams, count, K)
        interior = ((ty >= 1) & (ty <= gTY - 2)
                    & (tx >= 1) & (tx <= gTX - 2))
        src_out = [jnp.where(interior, s, -1) for s in src_out]
        pid_out = [jnp.where(interior, q, _BIGPID) for q in pid_out]
        count = jnp.where(interior, count, 0)
        outs[no * pi][...] = jnp.concatenate(src_out, axis=0)
        outs[no * pi + 1][...] = jnp.concatenate(pid_out, axis=0)
        if r0 is None:
            rad_out = [jnp.where(interior, rq, 0.0) for rq in rad_out]
            outs[no * pi + 2][...] = jnp.concatenate(rad_out, axis=0)
        outs[no * pi + no - 1][...] = count[0]


def _specs(cap: int, DYp: int, DX: int):
    nb = DYp // BAND

    def mid(i):
        return (0, i, 0)

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec3(c):
        return [pl.BlockSpec((c, BAND, DX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    def spec1(c):
        return pl.BlockSpec((c, BAND, DX), mid, memory_space=pltpu.VMEM)

    return nb, spec3, spec1


def _rank_r0(config: SimConfig):
    """Uniform-radius constant for the GS kernels, or None.  Rides the
    engine-validated SimConfig.tiled_uniform_radius premise (TiledEngine
    checks the actual radii at init/spawn and auto-falls-back)."""
    return (config.initial_radius if config.tiled_uniform_radius
            else None)


def rank_parity(subs, one, config: SimConfig, cap: int, K: int, t: float,
                gTY: int, gTX: int):
    """Per-parity occupancy tables: {parity: (src, rpid, rrad)} plus the
    summed overflow (count > K) — same accounting as _rank_full.  Under
    tiled_uniform_radius rrad is None (the solve uses the constant)."""
    impl = config.gs_rank
    if impl == "auto":
        impl = "net"  # hardware-verified (scripts/tpu_probe_gsrank.py)
    r0 = _rank_r0(config)
    fields = ("x", "y", "pid") if r0 is not None else ("x", "y", "r",
                                                       "pid")
    nf = len(fields)
    DYp, DX = subs["x"][(0, 0)].shape[1:]
    nb, spec3, spec1 = _specs(cap, DYp, DX)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    tbl_specs = [spec1(K)] * 2 + ([] if r0 is not None else [spec1(K)])
    tbl_shapes = ([_sds((K, DYp, DX), jnp.int32),
                   _sds((K, DYp, DX), jnp.int32)]
                  + ([] if r0 is not None
                     else [_sds((K, DYp, DX), jnp.float32)]))
    no = len(tbl_specs) + 1

    if _fused(config):
        cnt_spec = pl.BlockSpec((BAND, DX), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            partial(_rank_kernel_par_all, cap=cap, K=K, t=t, impl=impl,
                    gTY=gTY, gTX=gTX, r0=r0),
            grid=(nb,),
            in_specs=[smem] + [s for _ in range(nf) for p in _PARS
                               for s in spec3(cap)],
            out_specs=tuple(tbl_specs + [cnt_spec]) * 4,
            out_shape=tuple(
                (tbl_shapes + [_sds((DYp, DX), jnp.int32)]) * 4),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(one,
          *[subs[n][p] for n in fields
            for p in _PARS for _ in range(3)])
        tables = {}
        overflow = jnp.int32(0)
        for pi, p in enumerate(_PARS):
            row = outs[no * pi:no * pi + no]
            tables[p] = ((row[0], row[1], None) if r0 is not None
                         else (row[0], row[1], row[2]))
            overflow = overflow + jnp.sum(
                jnp.maximum(row[no - 1] - K, 0))
        return tables, overflow

    tables = {}
    overflow = jnp.int32(0)
    for (pa, pb) in _PARS:
        row = pl.pallas_call(
            partial(_rank_kernel_par, cap=cap, K=K, t=t, impl=impl,
                    pa=pa, pb=pb, gTY=gTY, gTX=gTX, r0=r0),
            grid=(nb,),
            in_specs=[smem] + [s for _ in range(nf) for p in _PARS
                               for s in spec3(cap)],
            out_specs=tuple(tbl_specs) + (
                pl.BlockSpec((BAND, DX), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),),
            out_shape=tuple(tbl_shapes + [_sds((DYp, DX), jnp.int32)]),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(one,
          *[subs[n][p] for n in fields
            for p in _PARS for _ in range(3)])
        tables[(pa, pb)] = ((row[0], row[1], None) if r0 is not None
                            else (row[0], row[1], row[2]))
        overflow = overflow + jnp.sum(jnp.maximum(row[no - 1] - K, 0))
    return tables, overflow


# ---------------------------------------------------------------------------
# color solve/apply (existing dec kernels, no relayout around)
# ---------------------------------------------------------------------------

def _apply_integrate_dec_kernel(par_ref, *refs, cap: int, K: int, ac: int,
                                bc: int, config: SimConfig,
                                dt_scale: float, r0: float):
    """Color-4 apply with the substep's Verlet integration fused in
    (uniform-radius, box world): the apply already holds every
    particle's post-solve position in registers, so integrating here
    deletes the separate integrate pass (read x/y/px/py + write 4
    planes, ~1.0 ms @1M) for the price of px/py mid reads+writes.
    Math replicates ops/tiled.integrate's exact op order
    (particle_integration.wgsl:24-77 semantics).

    par_ref (SMEM, f32[4]) = [dt, mouse_x, mouse_y, mouse_pressed] —
    traced, so mouse/dt changes never recompile.
    refs: ux(3), uy(3), rpid(3); per parity x, y, px, py, pid mids;
    outs: per parity x, y, px, py."""
    uxr = _rows3(*(r[...] for r in refs[0:3]))
    uyr = _rows3(*(r[...] for r in refs[3:6]))
    rpr = _rows3(*(r[...] for r in refs[6:9]))
    mids = {p: tuple(refs[9 + 5 * i + j][...] for j in range(5))
            for i, p in enumerate(_PARS)}
    outs = refs[9 + 20:]

    dt = par_ref[0] * jnp.float32(dt_scale)
    dt2 = dt * dt
    mx, my = par_ref[1], par_ref[2]
    strength = jnp.float32(config.mouse_strength) * par_ref[3]
    gx = jnp.float32(config.gravity[0])
    gy = jnp.float32(config.gravity[1])
    r0c = jnp.float32(r0)
    wxc = jnp.float32(config.world_width) - r0c
    wyc = jnp.float32(config.world_height) - r0c

    for i, (pa, pb) in enumerate(_PARS):
        x_mid, y_mid, px_mid, py_mid, pid_mid = mids[(pa, pb)]
        dys = [0] if pa == ac else [-1, 1]
        dxs = [0] if pb == bc else [-1, 1]
        cells = []
        for dy in dys:
            for dx in dxs:
                oy = _dec_off(pa, dy, ac)
                ox = _dec_off(pb, dx, bc)
                cells.append((_lane(uxr[oy + 1], ox),
                              _lane(uyr[oy + 1], ox),
                              _lane(rpr[oy + 1], ox)))
        ox_l, oy_l, opx_l, opy_l = [], [], [], []
        for k in range(cap):
            mypid = pid_mid[k:k + 1]
            occ = mypid >= 0
            newx = x_mid[k:k + 1]
            newy = y_mid[k:k + 1]
            for ux_c, uy_c, rp_c in cells:
                for q in range(K):
                    hit = occ & (rp_c[q:q + 1] == mypid)
                    newx = jnp.where(hit, ux_c[q:q + 1], newx)
                    newy = jnp.where(hit, uy_c[q:q + 1], newy)
            # --- fused Verlet (ops/tiled.integrate op order) ---
            pxk = px_mid[k:k + 1]
            pyk = py_mid[k:k + 1]
            vel_x = newx - pxk
            vel_y = newy - pyk
            dxm = mx - newx
            dym = my - newy
            dist = jnp.sqrt(dxm * dxm + dym * dym)
            inv = jnp.where(dist > 1e-6,
                            1.0 / jnp.maximum(dist, 1e-6), 0.0)
            axk = gx + dxm * inv * strength
            ayk = gy + dym * inv * strength
            nx = newx + vel_x + axk * dt2
            ny = newy + vel_y + ayk * dt2
            nx = jnp.clip(nx, r0c, wxc)
            ny = jnp.clip(ny, r0c, wyc)
            ox_l.append(jnp.where(occ, nx, newx))
            oy_l.append(jnp.where(occ, ny, newy))
            opx_l.append(jnp.where(occ, newx, pxk))
            opy_l.append(jnp.where(occ, newy, pyk))
        outs[4 * i][...] = jnp.concatenate(ox_l, axis=0)
        outs[4 * i + 1][...] = jnp.concatenate(oy_l, axis=0)
        outs[4 * i + 2][...] = jnp.concatenate(opx_l, axis=0)
        outs[4 * i + 3][...] = jnp.concatenate(opy_l, axis=0)

def solve_parity(subs, one, config: SimConfig, cap: int, K: int,
                 t: float, gTY: int, gTX: int, integ=None):
    """One full GS solve (rank + 4 ordered color passes) in parity
    space; returns (updated subs, overflow delta).  Color loop mirrors
    gs_solve_pallas_mx exactly (same kernels, same order).

    ``integ`` = (StepParams, dt_scale) fuses this substep's Verlet
    integration into the color-4 apply (_apply_integrate_dec_kernel) —
    uniform-radius + box world only; the caller skips
    integrate_parity."""
    tables, overflow = rank_parity(subs, one, config, cap, K, t, gTY, gTX)
    r0 = _rank_r0(config)
    assert integ is None or (r0 is not None
                             and config.world_shape == "box")
    if (config.gs_colors_mega and r0 is not None
            and jax.default_backend() == "tpu"):
        # all 4 ordered color passes in one DMA-windowed kernel
        # (ops/gs_mega.py — bit-exact vs this loop on hardware,
        # scripts/tpu_probe_gs_mega.py); TPU-only (window DMAs)
        from gpu_physics_engine_tpu.ops.gs_mega import colors_mega
        return colors_mega(subs, tables, one, config, cap, K,
                           integ=integ), overflow
    DYp, DX = subs["x"][(0, 0)].shape[1:]
    nb, spec3, spec1 = _specs(cap, DYp, DX)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    xs = dict(subs["x"])
    ys = dict(subs["y"])
    ps = subs["pid"]
    out = dict(subs)
    for color in (1, 2, 3, 4):
        ac, bc = _mx_parity(color)
        src, rpid, rrad = tables[(ac, bc)]
        tbl_args = (src, rpid) if r0 is not None else (src, rpid, rrad)
        ux, uy = pl.pallas_call(
            partial(_solve_dec_kernel, cap=cap, K=K, ac=ac, bc=bc,
                    stiffness=config.stiffness, r0=r0),
            grid=(nb,),
            in_specs=([smem] + [s for p in _PARS for s in spec3(cap)]
                      + [s for p in _PARS for s in spec3(cap)]
                      + [spec1(K)] * len(tbl_args)),
            out_specs=(spec1(K), spec1(K)),
            out_shape=(_sds((K, DYp, DX), jnp.float32),
                       _sds((K, DYp, DX), jnp.float32)),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(one,
          *[b for p in _PARS for b in (xs[p], xs[p], xs[p])],
          *[b for p in _PARS for b in (ys[p], ys[p], ys[p])],
          *tbl_args)

        if color == 4 and integ is not None:
            params, dt_scale = integ
            pvec = jnp.stack([params.dt, params.mouse_x, params.mouse_y,
                              params.mouse_pressed]).astype(jnp.float32)
            pxs, pys = subs["px"], subs["py"]
            new = pl.pallas_call(
                partial(_apply_integrate_dec_kernel, cap=cap, K=K,
                        ac=ac, bc=bc, config=config, dt_scale=dt_scale,
                        r0=r0),
                grid=(nb,),
                in_specs=([smem] + spec3(K) + spec3(K) + spec3(K)
                          + [spec1(cap)] * 20),
                out_specs=tuple([spec1(cap)] * 16),
                out_shape=tuple(_sds((cap, DYp, DX), jnp.float32)
                                for _ in range(16)),
                compiler_params=_VMEM,
                interpret=_interpret(),
            )(pvec, ux, ux, ux, uy, uy, uy, rpid, rpid, rpid,
              *[b for p in _PARS
                for b in (xs[p], ys[p], pxs[p], pys[p], ps[p])])
            npx, npy = {}, {}
            for i, p in enumerate(_PARS):
                xs[p] = new[4 * i]
                ys[p] = new[4 * i + 1]
                npx[p] = new[4 * i + 2]
                npy[p] = new[4 * i + 3]
            out["px"] = npx
            out["py"] = npy
            break

        new = pl.pallas_call(
            partial(_apply_dec_kernel, cap=cap, K=K, ac=ac, bc=bc),
            grid=(nb,),
            in_specs=(spec3(K) + spec3(K) + spec3(K)
                      + [spec1(cap)] * 12),
            out_specs=tuple([spec1(cap)] * 8),
            out_shape=tuple(_sds((cap, DYp, DX), jnp.float32)
                            for _ in range(8)),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(ux, ux, ux, uy, uy, uy, rpid, rpid, rpid,
          *[b for p in _PARS for b in (xs[p], ys[p], ps[p])])
        for i, p in enumerate(_PARS):
            xs[p] = new[2 * i]
            ys[p] = new[2 * i + 1]

    out["x"] = xs
    out["y"] = ys
    return out, overflow


# ---------------------------------------------------------------------------
# pull relocate, per parity (matching cores shared with the flat kernels)
# ---------------------------------------------------------------------------

def _plan_kernel_par(*refs, cap: int, t: float, gTY: int, gTX: int,
                     match: str, delta: float, pa: int, pb: int):
    # refs: x, y, pid; each 4 parities x (up, mid, dn); then plan out
    rows = []
    for f in range(3):
        base = 12 * f
        rows.append({p: _rows3(*(r[...] for r in
                                 refs[base + 3 * i:base + 3 * i + 3]))
                     for i, p in enumerate(_PARS)})
    xr, yr, pr = rows
    plan_ref = refs[36]

    ty, tx = _coords(refs[1], pa, pb)
    vx = _par_views(xr, pa, pb, _NEIGHBORS)
    vy = _par_views(yr, pa, pb, _NEIGHBORS)
    vp = _par_views(pr, pa, pb, _NEIGHBORS)
    views = []
    for e_idx, (ey, ex) in enumerate(_NEIGHBORS):
        # single-chip grid: the full-coord bound doubles as the flat
        # kernel's slab-row/lane-wrap guard (garbage views can only feed
        # non-interior cells, whose plan is masked below anyway)
        valid_e = ((ty + ey >= 0) & (ty + ey <= gTY - 1)
                   & (tx + ex >= 0) & (tx + ex <= gTX - 1))
        views.append((vx[e_idx], vy[e_idx], vp[e_idx], valid_e, ey, ex))

    pid_mid = pr[(pa, pb)][1]
    chosen = _plan_choose(views, pid_mid, ty, tx, cap=cap, t=t,
                          gTY=gTY, gTX=gTX, match=match, delta=delta)
    free = pid_mid < 0
    interior = ((ty >= 1) & (ty <= gTY - 2) & (tx >= 1) & (tx <= gTX - 2))
    plan_ref[...] = jnp.where(free & interior,
                              jnp.concatenate(chosen, axis=0), -1)


def _apply_kernel_par(*refs, cap: int, t: float, gTY: int, gTX: int,
                      match: str, delta: float, pa: int, pb: int,
                      flds=_F):
    # refs: the parity-space fields (x, y, px, py, [r,] pid), plan; each
    # 4 parities x (up, mid, dn); then outs: len(flds) fields + defer
    rows = {}
    for f, n in enumerate(flds + ("plan",)):
        base = 12 * f
        rows[n] = {p: _rows3(*(r[...] for r in
                               refs[base + 3 * i:base + 3 * i + 3]))
                   for i, p in enumerate(_PARS)}
    outs = refs[12 * (len(flds) + 1):]

    my = {n: rows[n][(pa, pb)][1] for n in flds + ("plan",)}
    ty, tx = _coords(refs[1], pa, pb)

    # per-slot one-hop step targets of my occupants (same expression as
    # the plan side); single-chip: the in-grid gate is always true for
    # clipped targets but kept for op-parity with the flat kernel
    dty, dtx, moving = [], [], []
    for k in range(cap):
        oy_k, ox_k = _step_offsets(my["x"][k:k + 1], my["y"][k:k + 1],
                                   ty, tx, t=t, delta=delta,
                                   gTY=gTY, gTX=gTX)
        dty.append(oy_k)
        dtx.append(ox_k)
        in_grid = ((ty + dty[k] >= 0) & (ty + dty[k] <= gTY - 1))
        moving.append((my["pid"][k:k + 1] >= 0) & in_grid
                      & ((dty[k] != 0) | (dtx[k] != 0)))

    pviews = {n: _par_views(rows[n], pa, pb, _NEIGHBORS)
              for n in flds + ("plan",)}
    nbr_views = [({n: pviews[n][e] for n in flds}, pviews["plan"][e],
                  ey, ex)
                 for e, (ey, ex) in enumerate(_NEIGHBORS)]
    mids = {n: my[n] for n in flds + ("plan",)}
    out, defer = _apply_merge(mids, nbr_views, moving, dty, dtx,
                              cap=cap, match=match, fields=flds)

    for i, n in enumerate(flds):
        outs[i][...] = jnp.concatenate(out[n], axis=0)
    outs[len(flds)][...] = defer[0]


def _plan_kernel_par_all(*refs, cap: int, t: float, gTY: int, gTX: int,
                         match: str, delta: float):
    """All four parities' relocate plans in one kernel pass (4x less
    input HBM traffic than four _plan_kernel_par calls)."""
    rows = []
    for f in range(3):
        base = 12 * f
        rows.append({p: _rows3(*(r[...] for r in
                                 refs[base + 3 * i:base + 3 * i + 3]))
                     for i, p in enumerate(_PARS)})
    xr, yr, pr = rows
    outs = refs[36:]

    for pi, (pa, pb) in enumerate(_PARS):
        ty, tx = _coords(refs[1], pa, pb)
        vx = _par_views(xr, pa, pb, _NEIGHBORS)
        vy = _par_views(yr, pa, pb, _NEIGHBORS)
        vp = _par_views(pr, pa, pb, _NEIGHBORS)
        views = []
        for e_idx, (ey, ex) in enumerate(_NEIGHBORS):
            valid_e = ((ty + ey >= 0) & (ty + ey <= gTY - 1)
                       & (tx + ex >= 0) & (tx + ex <= gTX - 1))
            views.append((vx[e_idx], vy[e_idx], vp[e_idx], valid_e,
                          ey, ex))
        pid_mid = pr[(pa, pb)][1]
        chosen = _plan_choose(views, pid_mid, ty, tx, cap=cap, t=t,
                              gTY=gTY, gTX=gTX, match=match, delta=delta)
        free = pid_mid < 0
        interior = ((ty >= 1) & (ty <= gTY - 2)
                    & (tx >= 1) & (tx <= gTX - 2))
        outs[pi][...] = jnp.where(free & interior,
                                  jnp.concatenate(chosen, axis=0), -1)


def _apply_kernel_par_all(*refs, cap: int, t: float, gTY: int, gTX: int,
                          match: str, delta: float, flds=_F):
    """All four parities' relocate applies in one kernel pass; outputs
    are parity-major (len(flds) field planes + defer per parity)."""
    rows = {}
    for f, n in enumerate(flds + ("plan",)):
        base = 12 * f
        rows[n] = {p: _rows3(*(r[...] for r in
                               refs[base + 3 * i:base + 3 * i + 3]))
                   for i, p in enumerate(_PARS)}
    outs = refs[12 * (len(flds) + 1):]

    for pi, (pa, pb) in enumerate(_PARS):
        my = {n: rows[n][(pa, pb)][1] for n in flds + ("plan",)}
        ty, tx = _coords(refs[1], pa, pb)
        dty, dtx, moving = [], [], []
        for k in range(cap):
            oy_k, ox_k = _step_offsets(my["x"][k:k + 1], my["y"][k:k + 1],
                                       ty, tx, t=t, delta=delta,
                                       gTY=gTY, gTX=gTX)
            dty.append(oy_k)
            dtx.append(ox_k)
            in_grid = ((ty + dty[k] >= 0) & (ty + dty[k] <= gTY - 1))
            moving.append((my["pid"][k:k + 1] >= 0) & in_grid
                          & ((dty[k] != 0) | (dtx[k] != 0)))
        pviews = {n: _par_views(rows[n], pa, pb, _NEIGHBORS)
                  for n in flds + ("plan",)}
        nbr_views = [({n: pviews[n][e] for n in flds}, pviews["plan"][e],
                      ey, ex)
                     for e, (ey, ex) in enumerate(_NEIGHBORS)]
        out, defer = _apply_merge(my, nbr_views, moving, dty, dtx,
                                  cap=cap, match=match, fields=flds)
        no = len(flds) + 1
        for i, n in enumerate(flds):
            outs[no * pi + i][...] = jnp.concatenate(out[n], axis=0)
        outs[no * pi + len(flds)][...] = defer[0]


def relocate_parity(subs, config: SimConfig, cap: int, t: float,
                    gTY: int, gTX: int):
    """One pull-relocate pass in parity space: 4 plan kernels, then 4
    apply kernels (plans are all computed before any apply mutates
    state — same two-phase structure as the flat relocate).  Returns
    (updated subs, deferred-mover count)."""
    if (config.gs_relocate_mega and config.tiled_uniform_radius
            and jax.default_backend() == "tpu"):
        # plan + apply in one DMA-windowed pass (ops/gs_mega.py —
        # matching cores shared; bit-exact vs this path on hardware,
        # scripts/tpu_probe_gs_mega2.py); TPU-only (window DMAs)
        from gpu_physics_engine_tpu.ops.gs_mega import relocate_mega
        return relocate_mega(subs, config, cap, t, gTY, gTX,
                             _flds(config))
    match = config.tiled_match
    if match == "auto":
        # same auto rule as relocate_pallas, on the FULL grid dims
        match = "greedy" if (gTY * gTX <= 800_000 and cap <= 8) else "flip2"
    delta = config.hysteresis_delta
    flds = _flds(config)
    nf = len(flds)
    DYp, DX = subs["x"][(0, 0)].shape[1:]
    nb, spec3, spec1 = _specs(cap, DYp, DX)

    def _out_shapes():
        """len(flds) field planes (pid is int32) + the defer plane."""
        return ([_sds((cap, DYp, DX),
                      jnp.int32 if n == "pid" else jnp.float32)
                 for n in flds]
                + [_sds((DYp, DX), jnp.int32)])

    if _fused(config):
        plans4 = pl.pallas_call(
            partial(_plan_kernel_par_all, cap=cap, t=t, gTY=gTY, gTX=gTX,
                    match=match, delta=delta),
            grid=(nb,),
            in_specs=[s for _ in range(3) for p in _PARS
                      for s in spec3(cap)],
            out_specs=tuple([spec1(cap)] * 4),
            out_shape=tuple([_sds((cap, DYp, DX), jnp.int32)] * 4),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(*[subs[n][p] for n in ("x", "y", "pid")
            for p in _PARS for _ in range(3)])
        plans = dict(zip(_PARS, plans4))

        dspec = pl.BlockSpec((BAND, DX), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            partial(_apply_kernel_par_all, cap=cap, t=t, gTY=gTY,
                    gTX=gTX, match=match, delta=delta, flds=flds),
            grid=(nb,),
            in_specs=[s for _ in range(nf + 1) for p in _PARS
                      for s in spec3(cap)],
            out_specs=tuple([spec1(cap)] * nf + [dspec]) * 4,
            out_shape=tuple(_out_shapes()) * 4,
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(*[(subs[n] if n != "plan" else plans)[p]
            for n in flds + ("plan",) for p in _PARS for _ in range(3)])
        new_subs = {n: {} for n in flds}
        defer_total = jnp.int32(0)
        no = nf + 1
        for pi, p in enumerate(_PARS):
            for i, n in enumerate(flds):
                new_subs[n][p] = outs[no * pi + i]
            defer_total = defer_total + jnp.sum(outs[no * pi + nf])
        return new_subs, defer_total

    plans = {}
    for (pa, pb) in _PARS:
        plans[(pa, pb)] = pl.pallas_call(
            partial(_plan_kernel_par, cap=cap, t=t, gTY=gTY, gTX=gTX,
                    match=match, delta=delta, pa=pa, pb=pb),
            grid=(nb,),
            in_specs=[s for _ in range(3) for p in _PARS
                      for s in spec3(cap)],
            out_specs=spec1(cap),
            out_shape=_sds((cap, DYp, DX), jnp.int32),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(*[subs[n][p] for n in ("x", "y", "pid")
            for p in _PARS for _ in range(3)])

    new_subs = {n: dict(subs[n]) for n in flds}
    defer_total = jnp.int32(0)
    for (pa, pb) in _PARS:
        outs = pl.pallas_call(
            partial(_apply_kernel_par, cap=cap, t=t, gTY=gTY, gTX=gTX,
                    match=match, delta=delta, pa=pa, pb=pb, flds=flds),
            grid=(nb,),
            in_specs=[s for _ in range(nf + 1) for p in _PARS
                      for s in spec3(cap)],
            out_specs=tuple([spec1(cap)] * nf) + (
                pl.BlockSpec((BAND, DX), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),),
            out_shape=tuple(_out_shapes()),
            compiler_params=_VMEM,
            interpret=_interpret(),
        )(*[(subs[n] if n != "plan" else plans)[p]
            for n in flds + ("plan",) for p in _PARS for _ in range(3)])
        for i, n in enumerate(flds):
            new_subs[n][(pa, pb)] = outs[i]
        defer_total = defer_total + jnp.sum(outs[nf])
    return new_subs, defer_total


# ---------------------------------------------------------------------------
# integrate (elementwise; per-parity shims) + full step
# ---------------------------------------------------------------------------

def integrate_parity(subs, params, config: SimConfig, dt_scale: float):
    out = {n: dict(subs[n]) for n in subs}
    for p in _PARS:
        # uniform (_flds drops "r"): rebuild the plane on the fly — the
        # stored plane IS where(pid>=0, r0, 0) (see _flds), and the
        # constraint result is discarded on unoccupied slots anyway
        rad = (subs["r"][p] if "r" in subs
               else jnp.where(subs["pid"][p] >= 0,
                              jnp.float32(config.initial_radius),
                              jnp.float32(0.0)))
        shim = TileState(
            x=subs["x"][p], y=subs["y"][p], px=subs["px"][p],
            py=subs["py"][p], radius=rad, pid=subs["pid"][p],
            num_active=jnp.int32(0), overflow_count=jnp.int32(0))
        shim = integrate(shim, params, config, dt_scale=dt_scale)
        out["x"][p] = shim.x
        out["y"][p] = shim.y
        out["px"][p] = shim.px
        out["py"][p] = shim.py
    return out


def gs_parity_step_fn(carry, params, config: SimConfig,
                      do_relocate: bool = True):
    """One GS frame in parity space: relocate -> substeps x (ordered
    color solve -> integrate) — the same phase order as the flat GS
    branch of ops/tiled.tiled_step_fn (which relocates every step; the
    GS tile geometry makes the relocate ~0.3 ms @1M)."""
    subs, num_active, overflow = carry
    t, TY, TX = tile_geometry(config)
    cap = subs["x"][(0, 0)].shape[0]
    K = config.max_occupancy
    one = jnp.where(num_active >= 0, jnp.float32(1.0),
                    jnp.float32(2.0)).reshape((1,))

    if do_relocate:
        with jax.named_scope("relocate"):
            subs, defer = relocate_parity(subs, config, cap, t, TY, TX)
        overflow = overflow + defer
    # fuse each substep's Verlet into its color-4 apply where legal
    # (uniform radius + box world; gs_fuse_integrate overrides, None =
    # follow the fused-kernel gate).  Deletes the integrate pass
    # (~1.0 ms @1M, scripts/tpu_probe_gs_phase2.py).
    fuse_int = (config.gs_fuse_integrate
                if config.gs_fuse_integrate is not None
                else _fused(config))
    fuse_int = (fuse_int and _rank_r0(config) is not None
                and config.world_shape == "box")
    for _ in range(config.substeps):
        with jax.named_scope("solve_collisions"):
            subs, ovf = solve_parity(
                subs, one, config, cap, K, t, TY, TX,
                integ=((params, 1.0 / config.substeps)
                       if fuse_int else None))
        overflow = overflow + ovf
        if not fuse_int:
            with jax.named_scope("particle_integration"):
                subs = integrate_parity(subs, params, config,
                                        dt_scale=1.0 / config.substeps)
    return subs, num_active, overflow


def gs_solve_parity_full(state: TileState, config: SimConfig) -> TileState:
    """Solve-only full-space facade (gs_solve_pallas layout dispatch):
    decompose -> rank+4-color solve in parity space -> recompose.  Pays
    the same per-call relayout as the mx layout — use the engine's
    chunked path (gs_parity_tile_step) for production; this exists so
    the layout-parametrized oracle tests cover the parity kernels."""
    t, TY, TX = tile_geometry(config)
    cap = state.dims[0]
    K = config.max_occupancy
    one = jnp.where(state.num_active >= 0, jnp.float32(1.0),
                    jnp.float32(2.0)).reshape((1,))
    subs, _, _ = to_parity(state, config)
    subs, overflow = solve_parity(subs, one, config, cap, K, t, TY, TX)
    new = from_parity((subs, state.num_active, state.overflow_count),
                      state, config)
    return dataclasses.replace(
        new, px=state.px, py=state.py,
        overflow_count=state.overflow_count + overflow)


def gs_parity_tile_step(state: TileState, params, config: SimConfig,
                        n_steps: int = 1) -> TileState:
    """Full-space facade: decompose -> n parity steps -> recompose, all
    inside one traced program.  TiledEngine uses this for its single
    steps and scanned chunks (the conversion amortizes over n_steps)."""
    carry = to_parity(state, config)
    if n_steps == 1:
        carry = gs_parity_step_fn(carry, params, config)
    else:
        carry = jax.lax.scan(
            lambda c, _: (gs_parity_step_fn(c, params, config), None),
            carry, None, length=n_steps)[0]
    return from_parity(carry, state, config)
