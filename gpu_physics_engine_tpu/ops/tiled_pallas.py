"""Pallas collide kernel for the persistent tiled pipeline.

The jnp collide (ops/tiled.py) is a 9 x CAP chain of shifted elementwise
ops; its performance hangs on XLA fusing ~150 iterations into few HBM
passes.  This kernel removes that bet: a grid over BAND(=8)-row bands of
the tile grid where each program receives its band plus the neighbor bands
in VMEM, runs the whole 3x3 x CAP pair sweep on-chip, and writes the
updated band once.  Traffic = 3 reads + 1 write of the state regardless of
CAP; compute = 9*CAP pair tests per slot on the VPU.

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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


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


def _collide_band_kernel(xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd,
                         outx_ref, outy_ref, *, cap: int, stiffness: float):
    x, y, r = xm[...], ym[...], rm[...]
    occ = (pm[...] >= 0).astype(jnp.float32)

    xa, xb = _neighbor_rows(xu[...], x, xd[...])
    ya, yb = _neighbor_rows(yu[...], y, yd[...])
    ra, rb = _neighbor_rows(ru[...], r, rd[...])
    pa, pb = _neighbor_rows(pu[...], pm[...], pd[...])
    oa = (pa >= 0).astype(jnp.float32)
    ob = (pb >= 0).astype(jnp.float32)

    acc_x = jnp.zeros_like(x)
    acc_y = jnp.zeros_like(y)
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1, 1), 0)

    for row, (xr, yr, rr, orow) in enumerate(
            ((xa, ya, ra, oa), (x, y, r, occ), (xb, yb, rb, ob))):
        for dx in (-1, 0, 1):
            if dx == 0:
                xo, yo, ro, oo = xr, yr, rr, orow
            else:
                tx = xr.shape[2]
                sh = (-dx) % tx  # pltpu.roll wants non-negative shifts
                xo = pltpu.roll(xr, shift=sh, axis=2)
                yo = pltpu.roll(yr, shift=sh, axis=2)
                ro = pltpu.roll(rr, shift=sh, axis=2)
                oo = pltpu.roll(orow, shift=sh, axis=2)
            self_tile = row == 1 and dx == 0

            def slot_body(k, accs, xo=xo, yo=yo, ro=ro, oo=oo,
                          self_tile=self_tile):
                ax, ay = accs
                xk = xo[k:k + 1]
                yk = yo[k:k + 1]
                rk = ro[k:k + 1]
                ok = oo[k:k + 1]

                ddx = x - xk
                ddy = y - yk
                dist = jnp.sqrt(ddx * ddx + ddy * ddy)
                rsum = r + rk
                pair = ((rsum * rsum > dist * dist)
                        & (dist > MIN_DISTANCE)).astype(jnp.float32)
                if self_tile:
                    # mask the self-pair (slot k against itself)
                    pair = pair * (slot != k).astype(jnp.float32)
                w = pair * occ * ok
                safe = jnp.maximum(dist, MIN_DISTANCE)
                pen = (rsum - dist) * jnp.float32(stiffness)
                # my half of the pair correction (inverse-mass split,
                # collision_solver.wgsl:101-110)
                wi = rk / jnp.maximum(rsum, MIN_DISTANCE)
                return (ax + ddx / safe * pen * wi * w,
                        ay + ddy / safe * pen * wi * w)

            # static unroll: Mosaic has no dynamic_slice on values, so a
            # fori_loop over slots cannot lower (learned on hardware)
            for k in range(cap):
                acc_x, acc_y = slot_body(k, (acc_x, acc_y))

    outx_ref[...] = x + acc_x
    outy_ref[...] = y + acc_y


def collide_pallas(state: TileState, config: SimConfig) -> TileState:
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

    in_specs = []
    args = []
    for a in (x, y, r, pid):
        in_specs += [spec(up), spec(mid), spec(dn)]
        args += [a, a, a]
    out_spec = pl.BlockSpec((cap, BAND, TX), mid, memory_space=pltpu.VMEM)

    kernel = partial(_collide_band_kernel, cap=cap,
                     stiffness=config.stiffness)
    # 14 blocks x cap*BAND*TX*4B, double-buffered: past the 16MB default
    # scoped-VMEM limit at full world width (19.25M at cap=16, TX=1388);
    # v5e has headroom, so raise the soft limit instead of shrinking blocks
    vmem_bytes = 4 * (14 * cap * BAND * TX * 4 + (1 << 20))
    nx, ny = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((cap, TYp, TX), jnp.float32),
            jax.ShapeDtypeStruct((cap, TYp, TX), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 100 * (1 << 20))),
        interpret=_interpret(),
    )(*args)
    if pad:
        nx = nx[:, :TY]
        ny = ny[:, :TY]
    return dataclasses.replace(state, x=nx, y=ny)
