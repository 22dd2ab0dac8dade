"""Pallas kernels for the persistent tiled pipeline: collide + relocate.

The jnp collide (ops/tiled.py) is a 9 x CAP chain of shifted elementwise
ops; its performance hangs on XLA fusing ~150 iterations into few HBM
passes.  This kernel removes that bet: a grid over BAND(=8)-row bands of
the tile grid where each program receives its band plus the neighbor bands
in VMEM, runs the whole 3x3 x CAP pair sweep on-chip, and writes the
updated band once.  Traffic = 3 reads + 1 write of the state regardless of
CAP; compute = 9*CAP pair tests per slot on the VPU.

`relocate_pallas` replaces the claim-based jnp relocate (ops/tiled.py)
whose fixed mover buffer cannot keep up in dense scenes: at the
reference's 4M-particle config the world is ~98% covered, every step
~5-10% of particles cross a tile edge, and a 32k buffer defers millions
(measured: overflow_count +2.7M/step on hardware).  The pull formulation
needs no buffer at all — two band kernels:

  pass 1 (plan): every tile examines its 8 neighbors' slot k and records,
    per FREE own slot k, the first neighbor (fixed priority order) whose
    slot-k occupant wants to move here.  Movers >1 tile from home claim
    the adjacent tile toward home (one hop per step), so even violent
    displacement converges without ever losing a particle.
  pass 2 (apply): symmetric — each tile pulls the planned in-movers and
    drops occupants whose target's plan names them (both sides read the
    same plan, so the decision is consistent without communication).
    Movers that found no free slot stay put, retry next step, and are
    counted in overflow_count; the 3x3 collide window keeps their pair
    set correct while AT MOST ONE tile stale.  A particle displaced more
    than one tile in a single step (or deferred repeatedly under
    contention) is multi-hop stale: it interacts with the wrong
    neighborhood for every step until the one-hop walk catches up.  The
    engine therefore forces a periodic exact claim-relocate sweep
    (TiledEngine._sweep) even when sort_interval_steps == 0 — do not run
    long pull-relocate simulations without that safety net.

Mosaic layout rules (learned on hardware): a block's last two dims must be
multiples of (8, 128) or equal to the array dims.  Hence bands of 8 tile
rows (f32 sublane tile) with the full TX extent in lanes, not single rows;
`tile_geometry` pads TY to a multiple of 8 so the band grid divides evenly
(callers with odd row counts — e.g. sharded slabs — are padded here).

Neighbor rows: band i's "row above" is band i's rows shifted down by one
with row 0 taken from band i-1's last row (sublane roll + iota select);
clamped index maps at the world edge duplicate the mid band, which is
harmless because the affected rows (global 0 and TY-1) are the engine's
empty border ring — their occupancy masks every contribution.

Same math and pair set as ops/tiled.py::collide — the test suite checks
agreement in interpret mode.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.tiled import MIN_DISTANCE, TileState

BAND = 8  # rows per program = f32 sublane tile


def _vmem_limit() -> int:
    """Scoped-VMEM limit for every kernel here.  116M default (v5e has
    128M physical; the 16M Mosaic default stack-OOMs these kernels —
    round-1 finding).  GPE_VMEM_LIMIT_MB overrides for edge probes:
    the 32M-particle relocate-apply missed 116M by 5.95M at TX=7392
    (docs/probes_r5/tpu_probe_32m.jsonl cap5 signature)."""
    import os
    return int(os.environ.get("GPE_VMEM_LIMIT_MB", "116")) * (1 << 20)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sds(shape, dtype, vma=None):
    """ShapeDtypeStruct for pallas_call out_shape.  ``vma`` names the mesh
    axes the output varies over — required when the kernel runs inside a
    ``jax.shard_map`` with ``check_vma=True`` (parallel/tiled_shard.py);
    None outside shard_map."""
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))


def _neighbor_rows(u, m, d):
    """(above, below) row views of the mid band: above[j] = global row
    before m[j], below[j] = global row after m[j]."""
    band = m.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    above = jnp.where(row == 0,
                      pltpu.roll(u, 1, axis=1), pltpu.roll(m, 1, axis=1))
    below = jnp.where(row == band - 1,
                      pltpu.roll(d, band - 1, axis=1),
                      pltpu.roll(m, band - 1, axis=1))
    return above, below


def _pair_sweep(xu, xm, xd, yu, ym, yd, rrefs, pu, pm, pd,
                *, cap: int, stiffness: float, r0=None):
    """The 3x3 x CAP Jacobi pair sweep over one band: returns
    (x, y, acc_x, acc_y) — my loaded positions and my half of every pair
    correction (collision_solver.wgsl:60-118 math).

    ``rrefs`` = (ru, rm, rd) radius block refs, or None when ``r0`` is
    set: the uniform-radius specialization (SimConfig.tiled_uniform_radius
    — every particle has radius r0, the BASELINE scenes' case).  Then
    rsum = 2*r0 and the inverse-mass split rk/rsum = 1/2 are compile-time
    constants: the radius planes are never read (3 fewer input blocks of
    band traffic) and the per-candidate math drops the rsum add/mul and
    the second rsqrt (~30% fewer sweep ops).  Not bit-identical to the
    general path (the constants replace ulp-level rsqrt round trips);
    the pair SET is identical, so positions agree to ~1e-6 world units
    (tests/test_uniform_radius.py)."""
    x, y = xm[...], ym[...]
    occ = (pm[...] >= 0).astype(jnp.float32)

    xa, xb = _neighbor_rows(xu[...], x, xd[...])
    ya, yb = _neighbor_rows(yu[...], y, yd[...])
    pa, pb = _neighbor_rows(pu[...], pm[...], pd[...])
    oa = (pa >= 0).astype(jnp.float32)
    ob = (pb >= 0).astype(jnp.float32)
    if r0 is None:
        r = rrefs[1][...]
        ra, rb = _neighbor_rows(rrefs[0][...], r, rrefs[2][...])
        rows = ((xa, ya, ra, oa), (x, y, r, occ), (xb, yb, rb, ob))
        rsum_c = rsum2_c = half_stiff = None
    else:
        rows = ((xa, ya, None, oa), (x, y, None, occ), (xb, yb, None, ob))
        rsum_c = jnp.float32(2.0 * r0)
        rsum2_c = jnp.float32((2.0 * r0) * (2.0 * r0))
        # wi = rk/rsum = 1/2 folded into the stiffness constant
        half_stiff = jnp.float32(0.5 * stiffness)

    acc_x = jnp.zeros_like(x)
    acc_y = jnp.zeros_like(y)
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1, 1), 0)

    for row, (xr, yr, rr, orow) in enumerate(rows):
        for dx in (-1, 0, 1):
            if dx == 0:
                xo, yo, ro, oo = xr, yr, rr, orow
            else:
                tx = xr.shape[2]
                sh = (-dx) % tx  # pltpu.roll wants non-negative shifts
                xo = pltpu.roll(xr, shift=sh, axis=2)
                yo = pltpu.roll(yr, shift=sh, axis=2)
                ro = None if rr is None else pltpu.roll(rr, shift=sh, axis=2)
                oo = pltpu.roll(orow, shift=sh, axis=2)
            self_tile = row == 1 and dx == 0

            def slot_body(k, accs, xo=xo, yo=yo, ro=ro, oo=oo,
                          self_tile=self_tile):
                ax, ay = accs
                xk = xo[k:k + 1]
                yk = yo[k:k + 1]
                ok = oo[k:k + 1]

                # rsqrt formulation, identical op order to ops/tiled.py's
                # jnp collide (no sqrt/div: they dominate VPU sweep cost)
                ddx = x - xk
                ddy = y - yk
                d2 = ddx * ddx + ddy * ddy
                if ro is None:
                    rsum2 = rsum2_c
                else:
                    rk = ro[k:k + 1]
                    rsum = r + rk
                    rsum2 = rsum * rsum
                pair = ((rsum2 > d2)
                        & (d2 > MIN_DISTANCE * MIN_DISTANCE)
                        ).astype(jnp.float32)
                if self_tile:
                    # mask the self-pair (slot k against itself)
                    pair = pair * (slot != k).astype(jnp.float32)
                w = pair * occ * ok
                inv = jax.lax.rsqrt(
                    jnp.maximum(d2, MIN_DISTANCE * MIN_DISTANCE))
                dist = d2 * inv
                if ro is None:
                    coef = inv * ((rsum_c - dist) * half_stiff) * w
                else:
                    pen = (rsum - dist) * jnp.float32(stiffness)
                    # my half of the pair correction (inverse-mass split,
                    # collision_solver.wgsl:101-110): wi = rk / rsum
                    wi = rk * jax.lax.rsqrt(
                        jnp.maximum(rsum2, MIN_DISTANCE * MIN_DISTANCE))
                    coef = inv * pen * wi * w
                return (ax + ddx * coef, ay + ddy * coef)

            # static unroll: Mosaic has no dynamic_slice on values, so a
            # fori_loop over slots cannot lower (learned on hardware)
            for k in range(cap):
                acc_x, acc_y = slot_body(k, (acc_x, acc_y))

    return x, y, acc_x, acc_y


def _pair_sweep_newton(xm, xd, ym, yd, rrefs, pm, pd, sx_ref, sy_ref,
                       *, cap: int, stiffness: float, r0=None):
    """Newton's-third-law pair sweep over one band (SimConfig.tiled_newton).

    The standard sweep (_pair_sweep) evaluates every cross-tile pair TWICE
    — each endpoint gathers its own half from all 9 neighbor offsets.
    Here each cross-tile pair is evaluated ONCE: only the self tile and
    the 4 FORWARD offsets (0,+1), (+1,-1), (+1,0), (+1,+1) are swept, and
    the reaction half is scattered back to the partner by rolling the
    per-slot reaction planes to the partner's tile (the reaction onto
    slot k of the partner is the sum over my slots of terms already
    computed for my half — one cap-axis reduction).  5*cap^2 candidate
    evaluations per tile instead of 9*cap^2 on a sweep that is VPU-bound
    (PERF.md roofline), and the 'up' neighbor blocks are never read
    (2 blocks/field instead of 3).

    Row band-1's dy=+1 reactions belong to the NEXT band's row 0: they
    are parked in VMEM scratch (sx_ref/sy_ref) and consumed by the next
    grid step — TPU Pallas grid steps execute sequentially on the core,
    so scratch written by band i is visible to band i+1 (verified in
    interpret mode too).  The last band's spill lands on the empty border
    ring (or on sharded halo rows the caller slices away) and dies there.

    Same pair set and per-pair math as _pair_sweep; the accumulation
    ORDER differs, so positions agree to f32 rounding (~1e-6 world
    units), not bitwise (tests/test_newton.py)."""
    x, y = xm[...], ym[...]
    pid_m = pm[...]
    occ = (pid_m >= 0).astype(jnp.float32)
    band = x.shape[1]
    ntx = x.shape[2]
    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    def below(m, d):
        # row j's "below" = global row j+1 (next band's row 0 at the seam)
        return jnp.where(row == band - 1, pltpu.roll(d, band - 1, axis=1),
                         pltpu.roll(m, band - 1, axis=1))

    xb = below(x, xd[...])
    yb = below(y, yd[...])
    ob = (below(pid_m, pd[...]) >= 0).astype(jnp.float32)
    if r0 is None:
        r = rrefs[0][...]
        rb = below(r, rrefs[1][...])
        rsum_c = rsum2_c = half_stiff = None
    else:
        r = rb = None
        rsum_c = jnp.float32(2.0 * r0)
        rsum2_c = jnp.float32((2.0 * r0) * (2.0 * r0))
        half_stiff = jnp.float32(0.5 * stiffness)

    # incoming spill: reactions from band i-1's last row onto my row 0.
    # Scratch is uninitialized at i == 0 (could hold NaN payloads on
    # hardware): zero it outright rather than masking around it.
    @pl.when(i == 0)
    def _zero_spill():
        sx_ref[...] = jnp.zeros_like(x)
        sy_ref[...] = jnp.zeros_like(x)

    acc_x = sx_ref[...]
    acc_y = sy_ref[...]
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1, 1), 0)
    min2 = MIN_DISTANCE * MIN_DISTANCE

    def pair_terms(xo, yo, ro, oo, k, self_tile):
        """Candidate slot k's pair terms vs all my slots.  Returns
        (my_x, my_y, bx, by): my half of the correction, plus — general
        radius only — the shared base terms (bx, by) the reaction is
        scaled from (uniform radius halves are symmetric: bx/by None)."""
        xk = xo[k:k + 1]
        yk = yo[k:k + 1]
        ok = oo[k:k + 1]
        ddx = x - xk
        ddy = y - yk
        d2 = ddx * ddx + ddy * ddy
        if ro is None:
            rsum2 = rsum2_c
        else:
            rk = ro[k:k + 1]
            rsum = r + rk
            rsum2 = rsum * rsum
        pair = ((rsum2 > d2) & (d2 > min2)).astype(jnp.float32)
        if self_tile:
            pair = pair * (slot != k).astype(jnp.float32)
        w = pair * occ * ok
        inv = jax.lax.rsqrt(jnp.maximum(d2, min2))
        dist = d2 * inv
        if ro is None:
            coef = inv * ((rsum_c - dist) * half_stiff) * w
            return ddx * coef, ddy * coef, None, None
        pen = (rsum - dist) * jnp.float32(stiffness)
        base = inv * pen * w * jax.lax.rsqrt(jnp.maximum(rsum2, min2))
        bx = ddx * base
        by = ddy * base
        # my half: partner's radius share (collision_solver.wgsl:101-110)
        return bx * rk, by * rk, bx, by

    # --- self tile: both halves in place, exactly like _pair_sweep ---
    for k in range(cap):
        mx_k, my_k, _, _ = pair_terms(x, y, r, occ, k, True)
        acc_x = acc_x + mx_k
        acc_y = acc_y + my_k

    # --- forward offsets: evaluate once, scatter the reaction ---
    spill_x = jnp.zeros_like(x)
    spill_y = jnp.zeros_like(y)
    for dy, (xs, ys, rs, os_) in ((0, (x, y, r, occ)),
                                  (1, (xb, yb, rb, ob))):
        for dx in ((1,) if dy == 0 else (-1, 0, 1)):
            xo = _lane(xs, dx)
            yo = _lane(ys, dx)
            ro = None if rs is None else _lane(rs, dx)
            oo = _lane(os_, dx)
            react_x = []
            react_y = []
            for k in range(cap):
                mx_k, my_k, bx, by = pair_terms(xo, yo, ro, oo, k, False)
                acc_x = acc_x + mx_k
                acc_y = acc_y + my_k
                if bx is None:  # uniform radius: symmetric halves
                    react_x.append(-jnp.sum(mx_k, axis=0, keepdims=True))
                    react_y.append(-jnp.sum(my_k, axis=0, keepdims=True))
                else:           # general: reaction scaled by MY radius
                    react_x.append(-jnp.sum(bx * r, axis=0, keepdims=True))
                    react_y.append(-jnp.sum(by * r, axis=0, keepdims=True))
            rx = jnp.concatenate(react_x, axis=0)
            ry = jnp.concatenate(react_y, axis=0)
            # move the reaction planes to the partner tile: +dx lanes
            # (wrap feeds the empty border columns — zero contributions),
            # +1 row, with the band-seam row parked in the spill carry
            if dx:
                rx = pltpu.roll(rx, dx % ntx, axis=2)
                ry = pltpu.roll(ry, dx % ntx, axis=2)
            if dy:
                rx = pltpu.roll(rx, 1, axis=1)
                ry = pltpu.roll(ry, 1, axis=1)
                seam = row == 0
                spill_x = spill_x + jnp.where(seam, rx, 0.0)
                spill_y = spill_y + jnp.where(seam, ry, 0.0)
                rx = jnp.where(seam, 0.0, rx)
                ry = jnp.where(seam, 0.0, ry)
            acc_x = acc_x + rx
            acc_y = acc_y + ry

    sx_ref[...] = spill_x
    sy_ref[...] = spill_y
    return x, y, acc_x, acc_y


def _collide_band_kernel(*refs, cap: int, stiffness: float, r0=None,
                         newton: bool = False):
    if newton:
        if r0 is None:
            (xm, xd, ym, yd, rm, rd, pm, pd,
             outx_ref, outy_ref, sx, sy) = refs
            rrefs = (rm, rd)
        else:
            xm, xd, ym, yd, pm, pd, outx_ref, outy_ref, sx, sy = refs
            rrefs = None
        x, y, acc_x, acc_y = _pair_sweep_newton(
            xm, xd, ym, yd, rrefs, pm, pd, sx, sy,
            cap=cap, stiffness=stiffness, r0=r0)
    else:
        if r0 is None:
            (xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd,
             outx_ref, outy_ref) = refs
            rrefs = (ru, rm, rd)
        else:
            xu, xm, xd, yu, ym, yd, pu, pm, pd, outx_ref, outy_ref = refs
            rrefs = None
        x, y, acc_x, acc_y = _pair_sweep(
            xu, xm, xd, yu, ym, yd, rrefs, pu, pm, pd,
            cap=cap, stiffness=stiffness, r0=r0)
    outx_ref[...] = x + acc_x
    outy_ref[...] = y + acc_y


def _newton_scratch(cap: int, TX: int):
    """VMEM scratch pair carrying the band-seam reaction spill."""
    return [pltpu.VMEM((cap, BAND, TX), jnp.float32)] * 2


def _collide_integrate_band_kernel(prm, *refs, cap: int, config):
    """Fused substep: pair sweep + Verlet integration + world constraint,
    one read and one write of the band per substep (the separate XLA
    integrate pass costs ~7 ms/step at 4M purely in pass overhead).
    prm (SMEM): [dt_scaled, mouse_x, mouse_y, pressed].
    With config.tiled_uniform_radius the radius blocks are absent from
    ``refs`` (never read; radius r0 = config.initial_radius is static)."""
    from gpu_physics_engine_tpu.ops.integrate import apply_world_constraint

    r0 = config.initial_radius if config.tiled_uniform_radius else None
    if config.tiled_newton:
        if r0 is None:
            (xm, xd, ym, yd, rm, rd, pm, pd, pxm, pym,
             ox, oy, opx, opy, sx, sy) = refs
            rrefs = (rm, rd)
        else:
            (xm, xd, ym, yd, pm, pd, pxm, pym,
             ox, oy, opx, opy, sx, sy) = refs
            rrefs = None
        x, y, acc_x, acc_y = _pair_sweep_newton(
            xm, xd, ym, yd, rrefs, pm, pd, sx, sy,
            cap=cap, stiffness=config.stiffness, r0=r0)
        r_mid = rrefs[0] if rrefs is not None else None
    elif r0 is None:
        (xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd, pxm, pym,
         ox, oy, opx, opy) = refs
        rrefs = (ru, rm, rd)
        x, y, acc_x, acc_y = _pair_sweep(
            xu, xm, xd, yu, ym, yd, rrefs, pu, pm, pd,
            cap=cap, stiffness=config.stiffness, r0=r0)
        r_mid = rm
    else:
        (xu, xm, xd, yu, ym, yd, pu, pm, pd, pxm, pym,
         ox, oy, opx, opy) = refs
        x, y, acc_x, acc_y = _pair_sweep(
            xu, xm, xd, yu, ym, yd, None, pu, pm, pd,
            cap=cap, stiffness=config.stiffness, r0=r0)
        r_mid = None
    cx = x + acc_x
    cy = y + acc_y

    occ = pm[...] >= 0
    r = jnp.float32(r0) if r0 is not None else r_mid[...]
    vel_x = cx - pxm[...]
    vel_y = cy - pym[...]
    dt = prm[0]
    mx, my_, pressed = prm[1], prm[2], prm[3]

    dxm = mx - cx
    dym = my_ - cy
    dist = jnp.sqrt(dxm * dxm + dym * dym)
    inv = jnp.where(dist > 1e-6, 1.0 / jnp.maximum(dist, 1e-6), 0.0)
    strength = jnp.float32(config.mouse_strength) * pressed
    ax = jnp.float32(config.gravity[0]) + dxm * inv * strength
    ay = jnp.float32(config.gravity[1]) + dym * inv * strength

    dt2 = dt * dt
    nx = cx + vel_x + ax * dt2
    ny = cy + vel_y + ay * dt2
    nx, ny = apply_world_constraint(nx, ny, r, config)

    ox[...] = jnp.where(occ, nx, cx)
    oy[...] = jnp.where(occ, ny, cy)
    opx[...] = jnp.where(occ, cx, pxm[...])
    opy[...] = jnp.where(occ, cy, pym[...])


def collide_pallas(state: TileState, config: SimConfig,
                   vma=None) -> TileState:
    """Drop-in replacement for ops/tiled.collide."""
    cap, TY, TX = state.dims
    pad = (-TY) % BAND
    x, y, r, pid = state.x, state.y, state.radius, state.pid
    if pad:  # sharded slabs etc.; single-chip TY is pre-padded (tile_geometry)
        width = ((0, 0), (0, pad), (0, 0))
        x = jnp.pad(x, width)
        y = jnp.pad(y, width)
        r = jnp.pad(r, width)
        pid = jnp.pad(pid, width, constant_values=-1)
    TYp = TY + pad
    nb = TYp // BAND

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def mid(i):
        return (0, i, 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec(index_map):
        return pl.BlockSpec((cap, BAND, TX), index_map,
                            memory_space=pltpu.VMEM)

    r0 = config.initial_radius if config.tiled_uniform_radius else None
    newton = config.tiled_newton
    fields = (x, y, pid) if r0 is not None else (x, y, r, pid)
    in_specs = []
    args = []
    for a in fields:
        if newton:
            in_specs += [spec(mid), spec(dn)]
            args += [a, a]
        else:
            in_specs += [spec(up), spec(mid), spec(dn)]
            args += [a, a, a]
    out_spec = pl.BlockSpec((cap, BAND, TX), mid, memory_space=pltpu.VMEM)

    kernel = partial(_collide_band_kernel, cap=cap,
                     stiffness=config.stiffness, r0=r0, newton=newton)
    # 14 blocks x cap*BAND*TX*4B double-buffered plus the unrolled sweep's
    # stack temporaries blow the 16MB default scoped-VMEM limit (measured
    # 19.25M blocks-only at cap=16, TX=1388; stack OOMs appear even on
    # small worlds).  v5e has 128M physical VMEM; use a flat generous cap.
    vmem_bytes = _vmem_limit()
    scratch = _newton_scratch(cap, TX) if newton else []
    nx, ny = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            _sds((cap, TYp, TX), jnp.float32, vma),
            _sds((cap, TYp, TX), jnp.float32, vma),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=_interpret(),
    )(*args)
    if pad:
        nx = nx[:, :TY]
        ny = ny[:, :TY]
    return dataclasses.replace(state, x=nx, y=ny)


def collide_integrate_pallas(state: TileState, params, config: SimConfig,
                             dt_scale: float = 1.0, vma=None) -> TileState:
    """One fused substep (collide + Verlet integrate), replacing
    ops/tiled.collide + ops/tiled.integrate on TPU."""
    cap, TY, TX = state.dims
    pad = (-TY) % BAND
    x, y, r, pid, px, py = (state.x, state.y, state.radius, state.pid,
                            state.px, state.py)
    if pad:
        width = ((0, 0), (0, pad), (0, 0))
        x, y, r, px, py = (jnp.pad(a, width) for a in (x, y, r, px, py))
        pid = jnp.pad(pid, width, constant_values=-1)
    TYp = TY + pad
    nb = TYp // BAND

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def mid(i):
        return (0, i, 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec(index_map):
        return pl.BlockSpec((cap, BAND, TX), index_map,
                            memory_space=pltpu.VMEM)

    prm = jnp.stack([params.dt * jnp.float32(dt_scale),
                     params.mouse_x, params.mouse_y,
                     params.mouse_pressed.astype(jnp.float32)])

    fields = ((x, y, pid) if config.tiled_uniform_radius
              else (x, y, r, pid))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [prm]
    for a in fields:
        if config.tiled_newton:  # the Newton sweep never reads 'up'
            in_specs += [spec(mid), spec(dn)]
            args += [a, a]
        else:
            in_specs += [spec(up), spec(mid), spec(dn)]
            args += [a, a, a]
    in_specs += [spec(mid), spec(mid)]
    args += [px, py]

    scratch = _newton_scratch(cap, TX) if config.tiled_newton else []
    kernel = partial(_collide_integrate_band_kernel, cap=cap, config=config)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(spec(mid),) * 4,
        out_shape=tuple(
            _sds((cap, TYp, TX), jnp.float32, vma) for _ in range(4)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(*args)
    nx, ny, npx, npy = outs
    if pad:
        nx, ny, npx, npy = (a[:, :TY] for a in (nx, ny, npx, npy))
    return dataclasses.replace(state, x=nx, y=ny, px=npx, py=npy)


# ---------------------------------------------------------------------------
# pull-based relocation (two band kernels: plan, then apply)
# ---------------------------------------------------------------------------

# fixed claim priority: first matching neighbor wins a free slot
_NEIGHBORS = ((-1, -1), (-1, 0), (-1, 1), (0, -1),
              (0, 1), (1, -1), (1, 0), (1, 1))


def _rows3(u, m, d):
    """(above, mid, below) row views from the up/mid/dn blocks."""
    a, b = _neighbor_rows(u, m, d)
    return a, m, b


def _lane(a, dx: int):
    """Neighbor column view (wrap hits the empty border columns)."""
    if dx == 0:
        return a
    return pltpu.roll(a, shift=(-dx) % a.shape[2], axis=2)


def _view(rows, dy: int, dx: int):
    return _lane(rows[dy + 1], dx)


def _home_tile(x, y, *, t: float, gTY: int, gTX: int):
    """Clipped home-tile coords of positions (ops/tiled.py::_tile_of)."""
    wy = jnp.clip(jnp.floor(y / jnp.float32(t)).astype(jnp.int32) + 1,
                  1, gTY - 2)
    wx = jnp.clip(jnp.floor(x / jnp.float32(t)).astype(jnp.int32) + 1,
                  1, gTX - 2)
    return wy, wx


def _step_offsets(x, y, sty, stx, *, t: float, delta: float,
                  gTY: int, gTX: int):
    """Per-axis one-hop offsets (-1/0/+1) toward home with hysteresis:
    a particle stored in global tile (sty, stx) — spanning
    [(s-1)*t, s*t) per axis — moves only once it is at least ``delta``
    world units past the boundary.  delta=0 reproduces the exact
    floor(pos/t) home logic; SimConfig.hysteresis_delta guarantees the
    3x3 pair windows stay complete for any in-band particle.  Targets
    never step onto the border ring."""
    tf = jnp.float32(t)
    d = jnp.float32(delta)
    dty = (y >= sty.astype(jnp.float32) * tf + d).astype(jnp.int32) - \
          (y < (sty - 1).astype(jnp.float32) * tf - d).astype(jnp.int32)
    dtx = (x >= stx.astype(jnp.float32) * tf + d).astype(jnp.int32) - \
          (x < (stx - 1).astype(jnp.float32) * tf - d).astype(jnp.int32)
    ty_t = sty + dty
    tx_t = stx + dtx
    dty = jnp.where((ty_t < 1) | (ty_t > gTY - 2), 0, dty)
    dtx = jnp.where((tx_t < 1) | (tx_t > gTX - 2), 0, dtx)
    return dty, dtx


def _relocate_plan_kernel(r0, xu, xm, xd, yu, ym, yd, pu, pm, pd,
                          plan_ref, *, cap: int, t: float, gTY: int,
                          gTX: int, local_rows: int, match: str = "flip",
                          delta: float = 0.0):
    """plan[k] = code of the in-mover accepted for my free slot k, or -1.
    match="flip": code = _NEIGHBORS index, source slot implied cap-1-k.
    match="greedy": code = e_idx*cap + s (explicit source slot).
    Step targets (one hop toward home, so always within 3x3) are computed
    in-kernel from positions — no materialized target maps in HBM.

    Flip gives every mover ONE chance per step (my slot cap-1-s must be
    free): cheap, and fine at small tiles where two movers rarely cross
    the same edge in the same step.  At coarse tiles, simultaneous
    crossers contend for the single matching slot and deferral explodes
    (measured 2-10%/step on the mid-size curve configs); greedy matches
    every free slot against every still-unclaimed mover in a fixed
    priority order — exact bipartite greedy, 8*cap^2 unrolled ops.

    r0 (SMEM scalar) is the slab's first global tile row: on a sharded
    slab my local row l is global row r0+l; gTY/gTX are the GLOBAL grid
    dims (home coords are clipped against them) and local_rows the slab's
    unpadded row count.  Single-chip: r0=0, local_rows=gTY."""
    x_rows = _rows3(xu[...], xm[...], xd[...])
    y_rows = _rows3(yu[...], ym[...], yd[...])
    p_rows = _rows3(pu[...], pm[...], pd[...])

    band = xm.shape[1]
    i = pl.program_id(0)
    my_row = (i * band + jax.lax.broadcasted_iota(
        jnp.int32, (1, band, xm.shape[2]), 1))       # local
    my_ty = my_row + r0[0]                            # global
    my_tx = jax.lax.broadcasted_iota(jnp.int32, (1, band, xm.shape[2]), 2)

    views = []
    for e_idx, (ey, ex) in enumerate(_NEIGHBORS):
        # hoist the shifted views out of the slot loop (one roll per field)
        x_e = _view(x_rows, ey, ex)
        y_e = _view(y_rows, ey, ex)
        p_e = _view(p_rows, ey, ex)
        # the clamped band-edge / lane-wrap views feed garbage rows when
        # the neighbor offset leaves the local slab — without this mask a
        # tile satisfies the relative claim test against a wrapped row and
        # DUPLICATES the particle (found by the conservation test)
        valid_e = ((my_row + ey >= 0) & (my_row + ey <= local_rows - 1)
                   & (my_tx + ex >= 0) & (my_tx + ex <= gTX - 1))
        views.append((x_e, y_e, p_e, valid_e, ey, ex))

    chosen = _plan_choose(views, p_rows[1], my_ty, my_tx, cap=cap, t=t,
                          gTY=gTY, gTX=gTX, match=match, delta=delta)

    pid_mid = p_rows[1]
    free = pid_mid < 0
    # only globally-interior REAL tiles may pull (step targets are always
    # interior: home coords are clipped).  The my_row < local_rows gate
    # matters on sharded slabs: a slab's pad rows alias the next slab's
    # global coordinates, and a leftover boundary crosser (migration
    # buffer overflow) would otherwise be pulled into a pad row by the
    # plan while the apply side's in-slab gate refuses to vacate it —
    # duplicating the particle.
    interior = ((my_ty >= 1) & (my_ty <= gTY - 2)
                & (my_tx >= 1) & (my_tx <= gTX - 2)
                & (my_row <= local_rows - 1))
    plan_ref[...] = jnp.where(free & interior,
                              jnp.concatenate(chosen, axis=0), -1)


def _plan_choose(views, pid_mid, my_ty, my_tx, *, cap: int, t: float,
                 gTY: int, gTX: int, match: str, delta: float):
    """Matching core of the relocate plan, over pre-built neighbor views:
    ``views`` = [(x_e, y_e, p_e, valid_e, ey, ex)] in _NEIGHBORS order,
    ``my_ty``/``my_tx`` = FULL-space tile coords (the parity driver in
    ops/gs_parity.py reconstructs them from sub-grid indices).  Returns
    the per-slot ``chosen`` code list (not yet free/interior-masked)."""

    def claim_mask(x_e, y_e, p_e, valid_e, ey, ex, s):
        # candidate's hysteresis one-hop step target == me?  it is stored
        # at (my_ty+ey, my_tx+ex), so it hops to me iff its per-axis
        # offsets equal (-ey, -ex)
        dty_c, dtx_c = _step_offsets(
            x_e[s:s + 1], y_e[s:s + 1], my_ty + ey, my_tx + ex,
            t=t, delta=delta, gTY=gTY, gTX=gTX)
        return (valid_e & (p_e[s:s + 1] >= 0)
                & (dty_c == -ey) & (dtx_c == -ex))

    chosen = [jnp.full_like(my_ty, -1) for _ in range(cap)]
    if match == "flip":
        for e_idx, (x_e, y_e, p_e, valid_e, ey, ex) in enumerate(views):
            for k in range(cap):
                # flipped-slot matching: tiles fill slots from 0 up (the
                # apply kernel recompacts), so movers sit LOW and free
                # slots HIGH; the flip aligns the two distributions
                claims = claim_mask(x_e, y_e, p_e, valid_e, ey, ex,
                                    cap - 1 - k)
                chosen[k] = jnp.where(claims & (chosen[k] < 0),
                                      e_idx, chosen[k])
    elif match == "flip2":
        # two chances per mover: the flip slot, then the direct slot —
        # claimed bookkeeping keeps pulls unique.  Costs ~2x flip's plan
        # selects (claim masks are computed once per (e, s) either way)
        # and cuts the contention deferral several-fold.  Plan code:
        # e_idx + 8*rule, source slot = cap-1-k (rule 0) or k (rule 1).
        claims_es = [[claim_mask(*views[e], s) for s in range(cap)]
                     for e in range(8)]
        claimed = [[jnp.zeros_like(claims_es[0][0]) for _ in range(cap)]
                   for _ in range(8)]
        for k in range(cap):
            free_k = pid_mid[k:k + 1] < 0
            for rule, s in ((0, cap - 1 - k), (1, k)):
                for e in range(8):
                    take = (free_k & claims_es[e][s] & ~claimed[e][s]
                            & (chosen[k] < 0))
                    chosen[k] = jnp.where(take, e + 8 * rule, chosen[k])
                    claimed[e][s] = claimed[e][s] | take
    else:  # greedy
        claims_es = [[claim_mask(*views[e], s) for s in range(cap)]
                     for e in range(8)]
        claimed = [[jnp.zeros_like(claims_es[0][0]) for _ in range(cap)]
                   for _ in range(8)]
        for k in range(cap):
            # only FREE slots claim — an occupied slot's chosen entry is
            # masked to -1 below, and letting it mark movers `claimed`
            # would starve the real free slots (measured: 70%/step
            # deferral at high occupancy)
            free_k = pid_mid[k:k + 1] < 0
            for e in range(8):
                for s in range(cap):
                    take = (free_k & claims_es[e][s] & ~claimed[e][s]
                            & (chosen[k] < 0))
                    chosen[k] = jnp.where(take, e * cap + s, chosen[k])
                    claimed[e][s] = claimed[e][s] | take
    return chosen


def _relocate_apply_kernel(r0, xu, xm, xd, yu, ym, yd, pxu, pxm, pxd,
                           pyu, pym, pyd, ru, rm, rd, pu, pm, pd,
                           plu, plm, pld,
                           ox, oy, opx, opy, orad, opid, odefer,
                           *, cap: int, t: float, gTY: int, gTX: int,
                           local_rows: int, match: str = "flip",
                           delta: float = 0.0):
    """Apply the plan: pull accepted in-movers, vacate accepted leavers,
    count deferred movers (wanted to move, no slot granted).  A slot never
    both receives and loses a particle in one step (plans cover only
    start-empty slots), so pull and vacate are independent selects.
    r0 = slab's first global row (see _relocate_plan_kernel).  Moves that
    would leave the local slab are never accepted here (the sharded caller
    ships boundary crossers separately BEFORE relocating; a crosser still
    present — e.g. migration-buffer overflow — must not be vacated against
    a garbage plan view)."""
    FIELDS = ("x", "y", "px", "py", "r", "pid")
    rows = {name: _rows3(u[...], m[...], d[...])
            for name, (u, m, d) in {
                "x": (xu, xm, xd), "y": (yu, ym, yd),
                "px": (pxu, pxm, pxd), "py": (pyu, pym, pyd),
                "r": (ru, rm, rd), "pid": (pu, pm, pd),
                "plan": (plu, plm, pld)}.items()}

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    my_row = (i * band
              + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))  # local
    my_ty = my_row + r0[0]                                       # global
    my_tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)

    # per-slot one-hop target offsets of my occupants (from mid positions,
    # the same _step_offsets expression the plan kernel evaluates)
    dty, dtx, moving = [], [], []
    for k in range(cap):
        oy_k, ox_k = _step_offsets(xm[k:k + 1], ym[k:k + 1], my_ty, my_tx,
                                   t=t, delta=delta, gTY=gTY, gTX=gTX)
        dty.append(oy_k)
        dtx.append(ox_k)
        in_slab = ((my_row + dty[k] >= 0)
                   & (my_row + dty[k] <= local_rows - 1))
        moving.append((pm[k:k + 1] >= 0) & in_slab
                      & ((dty[k] != 0) | (dtx[k] != 0)))

    mids = {n: rows[n][1] for n in FIELDS + ("plan",)}
    nbr_views = [({n: _view(rows[n], ey, ex) for n in FIELDS},
                  _view(rows["plan"], ey, ex), ey, ex)
                 for (ey, ex) in _NEIGHBORS]
    out, defer = _apply_merge(mids, nbr_views, moving, dty, dtx,
                              cap=cap, match=match)

    ox[...] = jnp.concatenate(out["x"], axis=0)
    oy[...] = jnp.concatenate(out["y"], axis=0)
    opx[...] = jnp.concatenate(out["px"], axis=0)
    opy[...] = jnp.concatenate(out["py"], axis=0)
    orad[...] = jnp.concatenate(out["r"], axis=0)
    opid[...] = jnp.concatenate(out["pid"], axis=0)
    odefer[...] = defer[0]


def _apply_merge(mids, nbr_views, moving, dty, dtx, *, cap: int,
                 match: str,
                 fields=("x", "y", "px", "py", "r", "pid")):
    """Pull/vacate/recompact core of the relocate apply, over pre-built
    neighbor views: ``mids`` = {field: mid block} incl "plan",
    ``nbr_views`` = [(field views, plan view, ey, ex)] in _NEIGHBORS
    order, ``moving``/``dty``/``dtx`` = per-slot mover gates and step
    offsets (the caller computes them — flat uses slab-local row gates,
    the parity driver in ops/gs_parity.py full-space coords).
    ``fields`` may omit "r" (the uniform-radius parity layout
    reconstructs it, ops/gs_parity._flds).  Returns (out field dict,
    defer counts)."""
    FIELDS = fields
    shape1 = mids["plan"][0:1].shape
    plan_mid = mids["plan"]

    accepted = [jnp.zeros(shape1, bool) for _ in range(cap)]
    new = {n: [mids[n][k:k + 1] for k in range(cap)] for n in FIELDS}
    for e_idx, (views, plan_e, ey, ex) in enumerate(nbr_views):
        # my index in the priority list of the target at offset (ey, ex)
        me_at_target = _NEIGHBORS.index((-ey, -ex))
        if match == "flip":
            for k in range(cap):
                s = cap - 1 - k  # flipped-slot matching (see plan kernel)
                # leave check: my slot k occupant heading to offset
                # (ey, ex) was accepted iff the target's plan for slot s
                # names me
                sel = moving[k] & (dty[k] == ey) & (dtx[k] == ex)
                accepted[k] = accepted[k] | (
                    sel & (plan_e[s:s + 1] == me_at_target))
                # pull check: my plan names neighbor e_idx for my slot k;
                # the in-mover sits in the neighbor's slot s
                hit = plan_mid[k:k + 1] == e_idx
                for n in FIELDS:
                    new[n][k] = jnp.where(hit, views[n][s:s + 1],
                                          new[n][k])
        elif match == "flip2":  # codes: e_idx + 8*rule
            for k in range(cap):
                # leave check: my slot k mover accepted under rule 0
                # (target dest cap-1-k) or rule 1 (target dest k)
                sel = moving[k] & (dty[k] == ey) & (dtx[k] == ex)
                acc = ((plan_e[cap - 1 - k:cap - k] == me_at_target)
                       | (plan_e[k:k + 1] == me_at_target + 8))
                accepted[k] = accepted[k] | (sel & acc)
                # pull check for my dest slot k
                hit0 = plan_mid[k:k + 1] == e_idx
                hit1 = plan_mid[k:k + 1] == e_idx + 8
                s0, s1 = cap - 1 - k, k
                for n in FIELDS:
                    v = jnp.where(hit0, views[n][s0:s0 + 1], new[n][k])
                    new[n][k] = jnp.where(hit1, views[n][s1:s1 + 1], v)
        else:  # greedy: plan codes are e_idx*cap + source_slot
            # leave check: any dest slot of the target names (me, k).
            # kd OUTER so a lazy per-plane view (the window-fused caller,
            # ops/gs_mega.py) reads each plan plane once per e; the
            # accepted[k] OR-accumulation is order-free — bit-identical.
            sel_k = [moving[k] & (dty[k] == ey) & (dtx[k] == ex)
                     for k in range(cap)]
            for kd in range(cap):
                pe = plan_e[kd:kd + 1]
                for k in range(cap):
                    accepted[k] = accepted[k] | (
                        sel_k[k] & (pe == me_at_target * cap + k))
            # pull check: my plan for dest slot k names (e_idx, s).
            # s OUTER (one lazy view plane per (e, s, field)); hits are
            # unique per k and for fixed k the s-chain applies in the
            # same order — bit-identical selection.
            for s in range(cap):
                vs = {n: views[n][s:s + 1] for n in FIELDS}
                for k in range(cap):
                    hit = plan_mid[k:k + 1] == e_idx * cap + s
                    for n in FIELDS:
                        new[n][k] = jnp.where(hit, vs[n], new[n][k])

    defer = jnp.zeros(shape1, jnp.int32)
    for k in range(cap):
        take_in = plan_mid[k:k + 1] >= 0
        # vacate accepted leavers (unless an in-mover took the slot, which
        # cannot happen: plans cover only start-empty slots)
        new["pid"][k] = jnp.where(accepted[k] & ~take_in, -1, new["pid"][k])
        defer = defer + (moving[k] & ~accepted[k]).astype(jnp.int32)

    # compact occupants to low slots: re-establishes the occupied-low /
    # free-high invariant the flipped-slot matching relies on, and breaks
    # retry livelocks (a deferred mover's claimed slot changes as tiles
    # recompact, so it finds space next step instead of waiting forever on
    # the one slot its first claim hit)
    occ_new = [new["pid"][k] >= 0 for k in range(cap)]
    rank = []
    running = jnp.zeros(shape1, jnp.int32)
    for k in range(cap):
        rank.append(running)
        running = running + occ_new[k].astype(jnp.int32)
    out = {n: [jnp.zeros(shape1, new[n][0].dtype) for _ in range(cap)]
           for n in FIELDS if n != "pid"}
    out["pid"] = [jnp.full(shape1, -1, jnp.int32) for _ in range(cap)]
    for k in range(cap):          # source slot
        for kd in range(k + 1):   # destination slot (rank can only drop)
            sel = occ_new[k] & (rank[k] == kd)
            for n in FIELDS:
                out[n][kd] = jnp.where(sel, new[n][k], out[n][kd])
    return out, defer


def relocate_pallas(state: TileState, config: SimConfig,
                    row0=None, global_rows: int | None = None,
                    vma=None) -> TileState:
    """Bufferless relocation: every mover takes (at most) one hop toward
    its home tile per step.  Drop-in replacement for ops/tiled.relocate
    (different slot assignment and deferral policy, same physics: particle
    positions are untouched; only storage location changes).

    Sharded slabs pass row0 (traced scalar: the slab's first global tile
    row) and global_rows (the full grid's row count) after shipping
    boundary crossers; moves that would leave the slab are left in place
    here."""
    from gpu_physics_engine_tpu.ops.tiled import tile_geometry

    cap, TY, TX = state.dims
    match = config.tiled_match
    if match == "auto":
        # greedy collapses the contention deferral that dominates
        # coarse-tile configs under flip (measured 3-20%/step -> ~0.1%)
        # for ~0.25-0.8 ms of 8*cap^2 unrolled ops; on big fine-tile
        # grids flip2 gives most of the deferral fix at ~flip cost.
        # (cap gate: greedy's kernel grows quadratically — at cap > 8
        # compile time and op count stop paying off, and high-cap
        # quality configs defer fine under flip2 anyway)
        match = "greedy" if (TY * TX <= 800_000 and cap <= 8) else "flip2"
    t = tile_geometry(config)[0]
    delta = config.hysteresis_delta
    gTY = TY if global_rows is None else global_rows
    gTX = TX
    local_rows = TY
    r0 = (jnp.zeros((1,), jnp.int32) if row0 is None
          else jnp.asarray(row0, jnp.int32).reshape((1,)))

    pad = (-TY) % BAND
    if pad:
        width = ((0, 0), (0, pad), (0, 0))
        arrs = dict(
            x=jnp.pad(state.x, width), y=jnp.pad(state.y, width),
            px=jnp.pad(state.px, width), py=jnp.pad(state.py, width),
            r=jnp.pad(state.radius, width),
            pid=jnp.pad(state.pid, width, constant_values=-1))
    else:
        arrs = dict(x=state.x, y=state.y, px=state.px, py=state.py,
                    r=state.radius, pid=state.pid)
    TYp = TY + pad
    nb = TYp // BAND

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def mid(i):
        return (0, i, 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec3():
        return [pl.BlockSpec((cap, BAND, TX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    vmem = pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit())
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    plan = pl.pallas_call(
        partial(_relocate_plan_kernel, cap=cap, t=t, gTY=gTY, gTX=gTX,
                local_rows=local_rows, match=match, delta=delta),
        grid=(nb,),
        in_specs=[smem] + spec3() * 3,
        out_specs=pl.BlockSpec((cap, BAND, TX), mid,
                               memory_space=pltpu.VMEM),
        out_shape=_sds((cap, TYp, TX), jnp.int32, vma),
        compiler_params=vmem,
        interpret=_interpret(),
    )(r0,
      arrs["x"], arrs["x"], arrs["x"],
      arrs["y"], arrs["y"], arrs["y"],
      arrs["pid"], arrs["pid"], arrs["pid"])

    mid_spec = pl.BlockSpec((cap, BAND, TX), mid, memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((BAND, TX), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_relocate_apply_kernel, cap=cap, t=t, gTY=gTY, gTX=gTX,
                local_rows=local_rows, match=match, delta=delta),
        grid=(nb,),
        in_specs=[smem] + spec3() * 6 + spec3(),
        out_specs=tuple([mid_spec] * 6 + [field_spec]),
        out_shape=tuple(
            [_sds((cap, TYp, TX), jnp.float32, vma)] * 5
            + [_sds((cap, TYp, TX), jnp.int32, vma),
               _sds((TYp, TX), jnp.int32, vma)]),
        compiler_params=vmem,
        interpret=_interpret(),
    )(r0,
      *[a for n in ("x", "y", "px", "py", "r", "pid")
        for a in (arrs[n],) * 3],
      plan, plan, plan)
    nx, ny, npx, npy, nr, npid, defer = outs
    if pad:
        nx, ny, npx, npy = nx[:, :TY], ny[:, :TY], npx[:, :TY], npy[:, :TY]
        nr, npid, defer = nr[:, :TY], npid[:, :TY], defer[:TY]
    return dataclasses.replace(
        state, x=nx, y=ny, px=npx, py=npy, radius=nr, pid=npid,
        overflow_count=state.overflow_count + jnp.sum(defer))


# ---------------------------------------------------------------------------
# single-kernel pull relocation: plans recomputed in-kernel (no plan array)
# ---------------------------------------------------------------------------

def _rows5(u, m, d):
    """Row views at offsets -2..+2 from the up/mid/dn blocks (8-row bands
    keep +-2 inside the three blocks)."""
    band = m.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    above2 = jnp.where(row < 2, pltpu.roll(u, 2, axis=1),
                       pltpu.roll(m, 2, axis=1))
    above1, below1 = _neighbor_rows(u, m, d)
    below2 = jnp.where(row >= band - 2, pltpu.roll(d, band - 2, axis=1),
                       pltpu.roll(m, band - 2, axis=1))
    return (above2, above1, m, below1, below2)


def _relocate_one_kernel(r0, xu, xm, xd, yu, ym, yd, pxu, pxm, pxd,
                         pyu, pym, pyd, ru, rm, rd, pu, pm, pd,
                         ox, oy, opx, opy, orad, opid, odefer,
                         *, cap: int, t: float, gTY: int, gTX: int,
                         local_rows: int):
    """Plan + apply in ONE kernel: my own plan and my 8 neighbors' plans
    are recomputed locally from the 5x5 window (8-row bands hold +-2 rows
    in the up/mid/dn blocks), removing the plan array's HBM round trip and
    the separate plan pass's field reads (~550 MB/step at 4M).  Claim
    semantics identical to _relocate_plan_kernel/_relocate_apply_kernel —
    the equality test pins bit-identical output."""
    FIELDS = ("x", "y", "px", "py", "r", "pid")
    rows5 = {"x": _rows5(xu[...], xm[...], xd[...]),
             "y": _rows5(yu[...], ym[...], yd[...]),
             "pid": _rows5(pu[...], pm[...], pd[...])}
    rows3 = {"px": _rows3(pxu[...], pxm[...], pxd[...]),
             "py": _rows3(pyu[...], pym[...], pyd[...]),
             "r": _rows3(ru[...], rm[...], rd[...])}
    rows3.update({n: tuple(rows5[n][1:4]) for n in ("x", "y", "pid")})

    def view5(name, dy, dx):
        return _lane(rows5[name][dy + 2], dx)

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    my_row = (i * band
              + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))  # local
    my_ty = my_row + r0[0]                                       # global
    my_tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)

    def plan_for(oy, ox_):
        """The plan of tile me+(oy, ox_), computed from my 5x5 views."""
        o_row = my_row + oy
        o_ty = my_ty + oy
        o_tx = my_tx + ox_
        chosen = [jnp.full(shape1, -1, jnp.int32) for _ in range(cap)]
        for e_idx, (ey, ex) in enumerate(_NEIGHBORS):
            cy, cx = oy + ey, ox_ + ex      # candidate offset from ME
            x_e = view5("x", cy, cx)
            y_e = view5("y", cy, cx)
            p_e = view5("pid", cy, cx)
            valid_e = ((o_row + ey >= 0) & (o_row + ey <= local_rows - 1)
                       & (o_tx + ex >= 0) & (o_tx + ex <= gTX - 1))
            for k in range(cap):
                s = cap - 1 - k
                wy, wx = _home_tile(x_e[s:s + 1], y_e[s:s + 1],
                                    t=t, gTY=gTY, gTX=gTX)
                claims = (valid_e & (p_e[s:s + 1] >= 0)
                          & (jnp.clip(wy - (o_ty + ey), -1, 1) == -ey)
                          & (jnp.clip(wx - (o_tx + ex), -1, 1) == -ex))
                chosen[k] = jnp.where(claims & (chosen[k] < 0),
                                      e_idx, chosen[k])
        free_pid = view5("pid", oy, ox_)
        interior = ((o_ty >= 1) & (o_ty <= gTY - 2)
                    & (o_tx >= 1) & (o_tx <= gTX - 2)
                    & (o_row <= local_rows - 1))
        return [jnp.where((free_pid[k:k + 1] < 0) & interior,
                          chosen[k], -1) for k in range(cap)]

    plan_mid = plan_for(0, 0)

    # per-slot one-hop targets of my occupants
    dty, dtx, moving = [], [], []
    for k in range(cap):
        wy, wx = _home_tile(xm[k:k + 1], ym[k:k + 1],
                            t=t, gTY=gTY, gTX=gTX)
        dty.append(jnp.clip(wy - my_ty, -1, 1))
        dtx.append(jnp.clip(wx - my_tx, -1, 1))
        in_slab = ((my_row + dty[k] >= 0)
                   & (my_row + dty[k] <= local_rows - 1))
        moving.append((pm[k:k + 1] >= 0) & in_slab
                      & ((dty[k] != 0) | (dtx[k] != 0)))

    accepted = [jnp.zeros(shape1, bool) for _ in range(cap)]
    new = {n: [rows3[n][1][k:k + 1] for k in range(cap)] for n in FIELDS}
    for e_idx, (ey, ex) in enumerate(_NEIGHBORS):
        views = {n: _lane(rows3[n][ey + 1], ex) for n in FIELDS}
        plan_e = plan_for(ey, ex)
        me_at_target = _NEIGHBORS.index((-ey, -ex))
        for k in range(cap):
            s = cap - 1 - k
            sel = moving[k] & (dty[k] == ey) & (dtx[k] == ex)
            accepted[k] = accepted[k] | (sel & (plan_e[s] == me_at_target))
            hit = plan_mid[k] == e_idx
            for n in FIELDS:
                new[n][k] = jnp.where(hit, views[n][s:s + 1], new[n][k])

    defer = jnp.zeros(shape1, jnp.int32)
    for k in range(cap):
        take_in = plan_mid[k] >= 0
        new["pid"][k] = jnp.where(accepted[k] & ~take_in, -1, new["pid"][k])
        defer = defer + (moving[k] & ~accepted[k]).astype(jnp.int32)

    # compaction (same as _relocate_apply_kernel)
    occ_new = [new["pid"][k] >= 0 for k in range(cap)]
    rank = []
    running = jnp.zeros(shape1, jnp.int32)
    for k in range(cap):
        rank.append(running)
        running = running + occ_new[k].astype(jnp.int32)
    out = {n: [jnp.zeros(shape1, new[n][0].dtype) for _ in range(cap)]
           for n in ("x", "y", "px", "py", "r")}
    out["pid"] = [jnp.full(shape1, -1, jnp.int32) for _ in range(cap)]
    for k in range(cap):
        for kd in range(k + 1):
            sel = occ_new[k] & (rank[k] == kd)
            for n in FIELDS:
                out[n][kd] = jnp.where(sel, new[n][k], out[n][kd])

    ox[...] = jnp.concatenate(out["x"], axis=0)
    oy[...] = jnp.concatenate(out["y"], axis=0)
    opx[...] = jnp.concatenate(out["px"], axis=0)
    opy[...] = jnp.concatenate(out["py"], axis=0)
    orad[...] = jnp.concatenate(out["r"], axis=0)
    opid[...] = jnp.concatenate(out["pid"], axis=0)
    odefer[...] = defer[0]


def relocate_pallas_one(state: TileState, config: SimConfig,
                        row0=None, global_rows: int | None = None
                        ) -> TileState:
    """Single-kernel variant of relocate_pallas: same semantics
    (bit-identical output, pinned by test), plans recomputed 9x in-kernel
    instead of a plan array round trip.  MEASURED SLOWER on hardware
    (net 6.4 vs 3.3 ms at the 4M production config) — the 5x5 view
    construction + 9x plan recompute cost more than the saved HBM
    traffic, so the two-pass version stays the production path.  Kept as
    the semantics cross-check and a recorded negative result."""
    from gpu_physics_engine_tpu.ops.tiled import tile_geometry

    cap, TY, TX = state.dims
    t = tile_geometry(config)[0]
    gTY = TY if global_rows is None else global_rows
    gTX = TX
    local_rows = TY
    r0 = (jnp.zeros((1,), jnp.int32) if row0 is None
          else jnp.asarray(row0, jnp.int32).reshape((1,)))

    pad = (-TY) % BAND
    if pad:
        width = ((0, 0), (0, pad), (0, 0))
        arrs = dict(
            x=jnp.pad(state.x, width), y=jnp.pad(state.y, width),
            px=jnp.pad(state.px, width), py=jnp.pad(state.py, width),
            r=jnp.pad(state.radius, width),
            pid=jnp.pad(state.pid, width, constant_values=-1))
    else:
        arrs = dict(x=state.x, y=state.y, px=state.px, py=state.py,
                    r=state.radius, pid=state.pid)
    TYp = TY + pad
    nb = TYp // BAND

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def mid(i):
        return (0, i, 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec3():
        return [pl.BlockSpec((cap, BAND, TX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    mid_spec = pl.BlockSpec((cap, BAND, TX), mid, memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((BAND, TX), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_relocate_one_kernel, cap=cap, t=t, gTY=gTY, gTX=gTX,
                local_rows=local_rows),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + spec3() * 6,
        out_specs=tuple([mid_spec] * 6 + [field_spec]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((cap, TYp, TX), jnp.float32)] * 5
            + [jax.ShapeDtypeStruct((cap, TYp, TX), jnp.int32),
               jax.ShapeDtypeStruct((TYp, TX), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(r0,
      *[a for n in ("x", "y", "px", "py", "r", "pid")
        for a in (arrs[n],) * 3])
    nx, ny, npx, npy, nr, npid, defer = outs
    if pad:
        nx, ny, npx, npy = nx[:, :TY], ny[:, :TY], npx[:, :TY], npy[:, :TY]
        nr, npid, defer = nr[:, :TY], npid[:, :TY], defer[:TY]
    return dataclasses.replace(
        state, x=nx, y=ny, px=npx, py=npy, radius=nr, pid=npid,
        overflow_count=state.overflow_count + jnp.sum(defer))
