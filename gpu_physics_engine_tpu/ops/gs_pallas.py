"""Pallas band kernels for the Gauss-Seidel parity solver (ops/gs_tiled.py).

Same schedule as the jnp formulation — tiles = reference cells, frozen
membership, 4 color passes of ordered in-cell sweeps — lowered to three
kernel families so the hot math runs on the VPU with banded VMEM reuse:

  R (rank, once per frame): per cell, test all 9*cap (neighbor, slot)
    candidates with the reference circle-vs-AABB membership
    (grid.wgsl:117-129) and select the <= K occupants in ascending-pid
    order (pids are unique).  Outputs per rank: the source code
    j*cap + s, the pid, the radius (all frozen for the frame), plus the
    per-cell occupant count for overflow accounting.
  C (solve, per color): resolve the ranked occupants' CURRENT positions
    through the source codes (static 36-way select — no dynamic
    indexing), run the sequential ascending (i, j) pair sweep with the
    scalar model's exact f32 op order, and write the K updated positions
    per cell.
  A (apply, per color): every particle pulls its updated position from
    the one active-color cell whose rank table names its pid (same-color
    cells are particle-disjoint, so the match is unique).

9 kernel launches per frame; per-launch overhead is ~0 (DESIGN.md §9) —
what matters is the banded traffic and the unrolled VPU math.

Like ops/gs_tiled.py this assumes storage tile == home cell (exact
relocation); the oracle tests drive it via interpret mode against the
scalar model and the jnp formulation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry
from gpu_physics_engine_tpu.ops.tiled_pallas import (
    BAND, _interpret, _neighbor_rows, _sds)

MIN_DISTANCE = 1e-4
# python int (module-level jnp constants init the backend at import and
# are captured as constants by compiled pallas kernels — see gs_tiled.py)
_BIGPID = 2**31 - 1
_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _rows3(u, m, d):
    a, b = _neighbor_rows(u, m, d)
    return a, m, b


def _lane(a, dx: int):
    if dx == 0:
        return a
    return pltpu.roll(a, shift=(-dx) % a.shape[2], axis=2)


def _view(rows, dy: int, dx: int):
    return _lane(rows[dy + 1], dx)


def _noc(x, one):
    """No-contract guard (see ops/gs_tiled._noc): a*b + c contracts into
    a fused multiply-add — legal and more precise, but 1 ulp off the
    scalar model's separate f32 mul+add on ~1% of pairs.  Multiplying
    the addend by a TRACED 1.0 makes any contraction exact:
    fma(x, 1, c) == x + c bitwise."""
    return x * one


def _sweep(lx, ly, lr, lpid, active, stiffness, one, r0=None):
    """Reference-ordered sequential pair sweep on rank-local values
    (collision_solver.wgsl:66-118 / reference_model.solve_colored).

    ``r0`` engages the uniform-radius specialization (all radii equal —
    SimConfig.tiled_uniform_radius): rsum and the mass split become
    compile-time f32 constants computed with the exact runtime op
    sequence (numpy f32), dropping two divisions and two maxes per
    pair.  Bit-identical to the general path wherever the backend's
    f32 division is IEEE (CPU; on the VPU the general path's runtime
    division is itself ulp-approximate, PERF.md "GS parity")."""
    K = len(lx)
    if r0 is not None:
        rsum_c = np.float32(r0) + np.float32(r0)
        rsum2_c = rsum_c * rsum_c
        w_c = np.float32(r0) / np.maximum(rsum_c, np.float32(MIN_DISTANCE))
    for a in range(K - 1):
        for b in range(a + 1, K):
            dx = lx[a] - lx[b]
            dy = ly[a] - ly[b]
            dist = jnp.sqrt(_noc(dx * dx, one) + _noc(dy * dy, one))
            rsum = rsum_c if r0 is not None else lr[a] + lr[b]
            rsum2 = rsum2_c if r0 is not None else rsum * rsum
            hit = (active & (rsum2 > dist * dist)
                   & (dist > MIN_DISTANCE)
                   & (lpid[a] < _BIGPID) & (lpid[b] < _BIGPID))
            safe = jnp.maximum(dist, MIN_DISTANCE)
            pen = rsum - dist
            cx = dx / safe * pen * stiffness
            cy = dy / safe * pen * stiffness
            if r0 is not None:
                wa = wb = w_c
            else:
                wa = lr[b] / jnp.maximum(rsum, MIN_DISTANCE)
                wb = lr[a] / jnp.maximum(rsum, MIN_DISTANCE)
            lx[a] = jnp.where(hit, lx[a] + _noc(cx * wa, one), lx[a])
            ly[a] = jnp.where(hit, ly[a] + _noc(cy * wa, one), ly[a])
            lx[b] = jnp.where(hit, lx[b] - _noc(cx * wb, one), lx[b])
            ly[b] = jnp.where(hit, ly[b] - _noc(cy * wb, one), ly[b])
    return lx, ly


def _member_streams_from_views(one, views, ty, tx, cap: int, t: float,
                               r0=None):
    """Candidate streams from pre-built neighbor views: ``views`` =
    [(x_e, y_e, r_e, p_e)] in _OFFS order, ``ty``/``tx`` = FULL-space
    tile coords of each lane's cell (the parity drivers reconstruct
    them from sub-grid indices).  Op-identical to the flat path.

    With ``r0`` (uniform radius, SimConfig.tiled_uniform_radius) the
    views are (x_e, y_e, p_e) triples — the radius planes are never
    read — and the membership radius is the compile-time constant
    r0*r0 (numpy f32 = the runtime f32 product, bit-identical);
    streams carry rad=None."""
    shape1 = ty.shape
    tf = jnp.float32(t)
    lox = (tx - 1).astype(jnp.float32) * tf  # my cell's AABB (world coords)
    loy = (ty - 1).astype(jnp.float32) * tf
    rr_c = None if r0 is None else np.float32(r0) * np.float32(r0)

    # membership per (j, s): circle strictly overlaps my cell's AABB.
    # NOTE: the full 2D clip is load-bearing even on axis-aligned
    # neighbors — under pull-relocate hysteresis a candidate may be
    # stored one tile off its home, so its center is NOT confined to the
    # storage tile's AABB and no per-offset specialization is valid.
    streams = []  # (pid_masked, rad, code)
    for j, view in enumerate(views):
        if r0 is None:
            x_e, y_e, r_e, p_e = view
        else:
            x_e, y_e, p_e = view
        for s in range(cap):
            cx = x_e[s:s + 1]
            cy = y_e[s:s + 1]
            cr = r_e[s:s + 1] if r0 is None else None
            px = jnp.clip(cx, lox, lox + tf)
            py = jnp.clip(cy, loy, loy + tf)
            d2 = (_noc((cx - px) * (cx - px), one)
                  + _noc((cy - py) * (cy - py), one))
            member = (p_e[s:s + 1] >= 0) & (
                d2 < rr_c if r0 is not None else d2 < cr * cr)
            streams.append((jnp.where(member, p_e[s:s + 1], _BIGPID),
                            cr, j * cap + s))

    count = jnp.zeros(shape1, jnp.int32)
    for pid_m, _, _ in streams:
        count = count + (pid_m < _BIGPID).astype(jnp.int32)
    return streams, count


def _member_streams(one, xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd,
                    cap: int, t: float):
    """Shared rank preamble: per cell, the 9*cap candidate streams with
    the reference circle-vs-AABB membership (grid.wgsl:117-129) applied.
    Returns (streams, count): streams = [(pid_masked, rad, code)] where
    pid_masked is the candidate's pid or _BIGPID for non-members, count =
    the per-cell member total (overflow accounting).  Used by both rank
    kernel implementations so their membership math is op-identical."""
    x_rows = _rows3(xu[...], xm[...], xd[...])
    y_rows = _rows3(yu[...], ym[...], yd[...])
    r_rows = _rows3(ru[...], rm[...], rd[...])
    p_rows = _rows3(pu[...], pm[...], pd[...])

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    ty = (i * band + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)
    views = [(_view(x_rows, dy, dx), _view(y_rows, dy, dx),
              _view(r_rows, dy, dx), _view(p_rows, dy, dx))
             for (dy, dx) in _OFFS]
    return _member_streams_from_views(one, views, ty, tx, cap, t)


def _rank_minloop_select(streams, count, K: int):
    """K rounds of min-pid selection over the candidate streams; returns
    (src_out, pid_out, rad_out) lists of K shape1 arrays."""
    shape1 = count.shape

    uniform = streams[0][1] is None
    taken = [jnp.zeros(shape1, bool) for _ in streams]
    src_out, pid_out, rad_out = [], [], []
    for _ in range(K):
        minpid = jnp.full(shape1, _BIGPID, jnp.int32)
        for idx, (pid_m, _, _) in enumerate(streams):
            minpid = jnp.minimum(
                minpid, jnp.where(taken[idx], _BIGPID, pid_m))
        valid = minpid < _BIGPID
        src_q = jnp.full(shape1, -1, jnp.int32)
        rad_q = None if uniform else jnp.zeros(shape1, jnp.float32)
        for idx, (pid_m, cr, code) in enumerate(streams):
            hitq = valid & ~taken[idx] & (pid_m == minpid)
            src_q = jnp.where(hitq, code, src_q)
            if not uniform:
                rad_q = jnp.where(hitq, cr, rad_q)
            taken[idx] = taken[idx] | hitq
        src_out.append(src_q)
        pid_out.append(jnp.where(valid, minpid, _BIGPID))
        rad_out.append(rad_q)
    return src_out, pid_out, None if uniform else rad_out


def _rank_kernel(one_ref, xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd,
                 src_ref, rpid_ref, rrad_ref, count_ref,
                 *, cap: int, K: int, t: float):
    one = one_ref[0]
    streams, count = _member_streams(
        one, xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd, cap, t)
    src_out, pid_out, rad_out = _rank_minloop_select(streams, count, K)

    src_ref[...] = jnp.concatenate(src_out, axis=0)
    rpid_ref[...] = jnp.concatenate(pid_out, axis=0)
    rrad_ref[...] = jnp.concatenate(rad_out, axis=0)
    count_ref[...] = count[0]


# ---------------------------------------------------------------------------
# rank v2 ("net"): pid-key selection network
# ---------------------------------------------------------------------------
#
# The minloop rank pays K rounds x 9*cap candidates of min+match+select
# (~K*9*cap*6 VPU ops/cell) — the dominant GS phase once the solve is
# color-decomposed (7.9 of 25.2 ms @1M, PERF.md).  With unique pids the
# same selection is a pure KEY problem on the masked pids themselves
# (members keep their pid, non-members are INT32_MAX): the K smallest
# keys ascending ARE the ranked occupants.  Keys sort with payload-free
# compare-exchanges (2 ops: min + max):
#   1. Batcher odd-even sorters over groups of m = 2^ceil(log2 max(K,4))
#   2. a balanced tree of truncated merges: of two ascending m-lists,
#      the m smallest are {min(A[i], B[m-1-i])} (bitonic half-cleaner on
#      A ++ reverse(B)), a bitonic list one log2(m)-stage merger sorts.
# Source codes and radii are recovered once at the end by matching the
# K selected pids against the 9*cap streams (one eq + two selects per
# candidate — the same loop the radius resolve needs anyway).  Keys are
# NOT packed with the source code: runtime pids are only bounded by
# int31 (spawn counters advance past refused inserts, checkpoints
# restore arbitrary ids), so a (pid << code_bits) packing could silently
# overflow; raw pids share minloop's exact domain.  Output is
# bit-identical to the minloop kernel (unique pids make the K-smallest
# selection unambiguous); the oracle tests assert it
# (tests/test_gs_rank.py).


def _oes_pairs(n: int):
    """Batcher odd-even mergesort compare-exchange pairs (i < j) for a
    power-of-two n; applying min->i / max->j in order sorts ascending."""
    assert n >= 1 and (n & (n - 1)) == 0
    pairs = []

    def merge(lo, m, r):
        step = r * 2
        if step < m:
            merge(lo, m, step)
            merge(lo + r, m, step)
            pairs.extend((i, i + r) for i in range(lo + r, lo + m - r, step))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, m):
        if m > 1:
            h = m // 2
            sort(lo, h)
            sort(lo + h, h)
            merge(lo, m, 1)

    sort(0, n)
    return pairs


def _bitonic_stages(m: int):
    """Compare-exchange pairs per stage of the bitonic merger for a
    power-of-two m: sorts any bitonic sequence ascending."""
    stages = []
    d = m // 2
    while d >= 1:
        stages.append([(i, i + d) for i in range(m) if (i % (2 * d)) < d])
        d //= 2
    return stages


def _sort_keys(keys):
    """In-place Batcher sort of a power-of-two list of key arrays."""
    for i, j in _oes_pairs(len(keys)):
        lo = jnp.minimum(keys[i], keys[j])
        hi = jnp.maximum(keys[i], keys[j])
        keys[i], keys[j] = lo, hi
    return keys


def _topm_merge(a, b):
    """The m smallest of two ascending m-lists, ascending (m = 2^k).
    min(a[i], b[m-1-i]) is the half-cleaner of the bitonic a ++ rev(b):
    it holds the m smallest as a multiset and is itself bitonic."""
    m = len(a)
    vals = [jnp.minimum(a[i], b[m - 1 - i]) for i in range(m)]
    for stage in _bitonic_stages(m):
        for i, j in stage:
            lo = jnp.minimum(vals[i], vals[j])
            hi = jnp.maximum(vals[i], vals[j])
            vals[i], vals[j] = lo, hi
    return vals


def _rank_net_select(streams, count, K: int):
    """Selection-network pick of the K smallest member pids; returns
    (src_out, pid_out, rad_out) lists of K shape1 arrays."""
    shape1 = count.shape

    m = 1 << max(2, (max(K, 1) - 1).bit_length())  # group size >= max(K, 4)
    assert m >= K
    groups = []
    for g0 in range(0, len(streams), m):
        grp = [pid_m for pid_m, _, _ in streams[g0:g0 + m]]
        while len(grp) < m:
            grp.append(jnp.full(shape1, _BIGPID, jnp.int32))
        groups.append(_sort_keys(grp))
    while len(groups) > 1:  # balanced merge tree
        groups = [_topm_merge(groups[i], groups[i + 1])
                  if i + 1 < len(groups) else groups[i]
                  for i in range(0, len(groups), 2)]
    top = groups[0]

    uniform = streams[0][1] is None
    src_out, pid_out, rad_out = [], [], []
    for q in range(K):
        pid_q = top[q]  # == _BIGPID when fewer than q+1 members
        valid = pid_q < _BIGPID
        # hoisted valid-mask: pid_q_safe = -2 when invalid can match no
        # masked stream pid (>= 0 or _BIGPID), so the per-stream
        # `valid &` is one select per q instead of one AND per
        # (q, stream) — bit-identical outputs
        pid_q_safe = jnp.where(valid, pid_q, -2)
        src_q = jnp.full(shape1, -1, jnp.int32)
        rad_q = None if uniform else jnp.zeros(shape1, jnp.float32)
        for pid_m, cr, code in streams:
            hit = pid_m == pid_q_safe
            src_q = jnp.where(hit, code, src_q)
            if not uniform:
                rad_q = jnp.where(hit, cr, rad_q)
        src_out.append(src_q)
        pid_out.append(pid_q)
        rad_out.append(rad_q)
    return src_out, pid_out, None if uniform else rad_out


def _rank_kernel_net(one_ref, xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd,
                     src_ref, rpid_ref, rrad_ref, count_ref,
                     *, cap: int, K: int, t: float):
    one = one_ref[0]
    streams, count = _member_streams(
        one, xu, xm, xd, yu, ym, yd, ru, rm, rd, pu, pm, pd, cap, t)
    src_out, pid_out, rad_out = _rank_net_select(streams, count, K)

    src_ref[...] = jnp.concatenate(src_out, axis=0)
    rpid_ref[...] = jnp.concatenate(pid_out, axis=0)
    rrad_ref[...] = jnp.concatenate(rad_out, axis=0)
    count_ref[...] = count[0]


def _rank_partial(config: SimConfig, cap: int, K: int, t: float):
    """Resolve SimConfig.gs_rank to a rank kernel for pallas_call (both
    implementations share signature, specs and bit-identical outputs)."""
    impl = config.gs_rank
    if impl == "auto":
        # hardware-verified (tpu_probe_gsrank.py, v5e @1M): rank-only
        # 6.89 ms (net) vs 7.79 (minloop), end-to-end flat 23.83 vs
        # 25.01; chains/overflow bit-equal on hardware
        impl = "net"
    if impl == "net":
        return partial(_rank_kernel_net, cap=cap, K=K, t=t)
    return partial(_rank_kernel, cap=cap, K=K, t=t)


def _solve_kernel(one_ref, xu, xm, xd, yu, ym, yd, src, rpid, rrad,
                  ux_ref, uy_ref, *, cap: int, K: int, color: int,
                  stiffness: float):
    one = one_ref[0]
    x_rows = _rows3(xu[...], xm[...], xd[...])
    y_rows = _rows3(yu[...], ym[...], yd[...])
    src_v = src[...]
    rpid_v = rpid[...]
    rrad_v = rrad[...]

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    ty = (i * band + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)
    active = (1 + ((tx - 1) & 1) + 2 * ((ty - 1) & 1)) == color

    # resolve ranked occupants' CURRENT positions through the source codes
    views = [(_view(x_rows, dy, dx), _view(y_rows, dy, dx))
             for (dy, dx) in _OFFS]
    lx, ly, lr, lpid = [], [], [], []
    for q in range(K):
        code_q = src_v[q:q + 1]
        xq = jnp.zeros(shape1, jnp.float32)
        yq = jnp.zeros(shape1, jnp.float32)
        for j in range(9):
            vx, vy = views[j]
            for s in range(cap):
                hitq = code_q == j * cap + s
                xq = jnp.where(hitq, vx[s:s + 1], xq)
                yq = jnp.where(hitq, vy[s:s + 1], yq)
        lx.append(xq)
        ly.append(yq)
        lr.append(rrad_v[q:q + 1])
        lpid.append(rpid_v[q:q + 1])

    lx, ly = _sweep(lx, ly, lr, lpid, active, jnp.float32(stiffness), one)
    ux_ref[...] = jnp.concatenate(lx, axis=0)
    uy_ref[...] = jnp.concatenate(ly, axis=0)


def _apply_kernel(uxu, uxm, uxd, uyu, uym, uyd, rpu, rpm, rpd,
                  xm, ym, pm, ox_ref, oy_ref,
                  *, cap: int, K: int, color: int):
    ux_rows = _rows3(uxu[...], uxm[...], uxd[...])
    uy_rows = _rows3(uyu[...], uym[...], uyd[...])
    rp_rows = _rows3(rpu[...], rpm[...], rpd[...])
    x_mid = xm[...]
    y_mid = ym[...]
    pid_mid = pm[...]

    band = xm.shape[1]
    i = pl.program_id(0)
    shape1 = (1, band, xm.shape[2])
    ty = (i * band + jax.lax.broadcasted_iota(jnp.int32, shape1, 1))
    tx = jax.lax.broadcasted_iota(jnp.int32, shape1, 2)

    newx = [x_mid[k:k + 1] for k in range(cap)]
    newy = [y_mid[k:k + 1] for k in range(cap)]
    for (dy, dx) in _OFFS:
        # is the cell at offset (dy, dx) from my tile of this color?
        cell_active = (1 + ((tx + dx - 1) & 1)
                       + 2 * ((ty + dy - 1) & 1)) == color
        ux_e = _view(ux_rows, dy, dx)
        uy_e = _view(uy_rows, dy, dx)
        rp_e = _view(rp_rows, dy, dx)
        for k in range(cap):
            mypid = pid_mid[k:k + 1]
            occ = mypid >= 0
            for q in range(K):
                hit = occ & cell_active & (rp_e[q:q + 1] == mypid)
                newx[k] = jnp.where(hit, ux_e[q:q + 1], newx[k])
                newy[k] = jnp.where(hit, uy_e[q:q + 1], newy[k])
    ox_ref[...] = jnp.concatenate(newx, axis=0)
    oy_ref[...] = jnp.concatenate(newy, axis=0)


def _rank_full(config: SimConfig, one, x, y, r, pid, cap: int, K: int,
               t: float):
    """Pad the full grid to a BAND-row multiple and run the rank kernel
    (implementation per SimConfig.gs_rank).  Returns
    (x, y, pid, src, rpid, rrad, count) with the pad rows retained —
    shared by the flat/dec/mx drivers, oracle tests and hardware probes."""
    TX = x.shape[2]
    TY = x.shape[1]
    pad = (-TY) % BAND
    if pad:
        width = ((0, 0), (0, pad), (0, 0))
        x = jnp.pad(x, width)
        y = jnp.pad(y, width)
        r = jnp.pad(r, width)
        pid = jnp.pad(pid, width, constant_values=-1)
    TYp = TY + pad
    nb = TYp // BAND

    def mid(i):
        return (0, i, 0)

    def spec3(c):
        def up(i):
            return (0, jnp.maximum(i - 1, 0), 0)

        def dn(i):
            return (0, jnp.minimum(i + 1, nb - 1), 0)
        return [pl.BlockSpec((c, BAND, TX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    src, rpid, rrad, count = pl.pallas_call(
        _rank_partial(config, cap, K, t),
        grid=(nb,),
        in_specs=[smem] + spec3(cap) * 4,
        out_specs=(pl.BlockSpec((K, BAND, TX), mid,
                                memory_space=pltpu.VMEM),) * 3 + (
            pl.BlockSpec((BAND, TX), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),),
        out_shape=(_sds((K, TYp, TX), jnp.int32),
                   _sds((K, TYp, TX), jnp.int32),
                   _sds((K, TYp, TX), jnp.float32),
                   _sds((TYp, TX), jnp.int32)),
        compiler_params=vmem,
        interpret=_interpret(),
    )(one, x, x, x, y, y, y, r, r, r, pid, pid, pid)
    return x, y, pid, src, rpid, rrad, count


def gs_solve_pallas(state: TileState, config: SimConfig) -> TileState:
    """Reference-parity GS solve, Pallas band kernels.  Dispatches on
    SimConfig.gs_layout: "flat" = full-grid checkerboard-masked kernels
    (25 ms @1M on v5e), "dec" = the 2x2 color-decomposed formulation
    (4x-smaller per-color grids, but the XLA stride-2
    decompose/recompose relayouts cost ~130 ms @1M — kept as the
    structural cross-check), "mx" = the same decomposed kernels with the
    relayouts done as blocked one-hot MATMULS (MXU-speed, bit-exact via
    u16 half splits — see _mx_deinterleave).  All bit-match the scalar
    model."""
    layout = config.gs_layout
    _, TY, TX = state.dims
    if layout == "dec" and (TY - 2 < 2 or TX - 2 < 2):
        layout = "flat"  # not decomposable (tiny grid)
    if layout in ("mx", "par") and (TY < 2 or TX < 2):
        layout = "flat"
    if layout == "dec":
        return gs_solve_pallas_dec(state, config)
    if layout == "mx":
        return gs_solve_pallas_mx(state, config)
    if layout == "par":
        from gpu_physics_engine_tpu.ops.gs_parity import gs_solve_parity_full
        return gs_solve_parity_full(state, config)
    return gs_solve_pallas_flat(state, config)


def gs_solve_pallas_flat(state: TileState, config: SimConfig) -> TileState:
    """Full-grid formulation of the GS solve (single-chip).
    Same frozen-membership 4-color schedule; bit-matches the scalar model
    (tests/test_gs_tiled.py runs it in interpret mode)."""
    t, TY, TX = tile_geometry(config)
    cap = state.dims[0]
    K = config.max_occupancy
    # traced 1.0 for the fma-contraction guard (_noc)
    one = jnp.where(state.num_active >= 0, jnp.float32(1.0),
                    jnp.float32(2.0)).reshape((1,))
    x, y, pid, src, rpid, rrad, count = _rank_full(
        config, one, state.x, state.y, state.radius, state.pid, cap, K, t)
    TYp = x.shape[1]
    nb = TYp // BAND

    def up(i):
        return (0, jnp.maximum(i - 1, 0), 0)

    def mid(i):
        return (0, i, 0)

    def dn(i):
        return (0, jnp.minimum(i + 1, nb - 1), 0)

    def spec3(c):
        return [pl.BlockSpec((c, BAND, TX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    def spec1(c):
        return pl.BlockSpec((c, BAND, TX), mid, memory_space=pltpu.VMEM)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    overflow = jnp.sum(jnp.maximum(count - K, 0))

    for color in (1, 2, 3, 4):
        ux, uy = pl.pallas_call(
            partial(_solve_kernel, cap=cap, K=K, color=color,
                    stiffness=config.stiffness),
            grid=(nb,),
            in_specs=[smem] + spec3(cap) * 2 + [spec1(K)] * 3,
            out_specs=(spec1(K), spec1(K)),
            out_shape=(_sds((K, TYp, TX), jnp.float32),
                       _sds((K, TYp, TX), jnp.float32)),
            compiler_params=vmem,
            interpret=_interpret(),
        )(one, x, x, x, y, y, y, src, rpid, rrad)

        x, y = pl.pallas_call(
            partial(_apply_kernel, cap=cap, K=K, color=color),
            grid=(nb,),
            in_specs=[*spec3(K) * 2, *spec3(K),
                      spec1(cap), spec1(cap), spec1(cap)],
            out_specs=(spec1(cap), spec1(cap)),
            out_shape=(_sds((cap, TYp, TX), jnp.float32),
                       _sds((cap, TYp, TX), jnp.float32)),
            compiler_params=vmem,
            interpret=_interpret(),
        )(ux, ux, ux, uy, uy, uy, rpid, rpid, rpid, x, y, pid)

    if TYp != TY:
        x = x[:, :TY]
        y = y[:, :TY]
    return dataclasses.replace(
        state, x=x, y=y,
        overflow_count=state.overflow_count + overflow)


# ---------------------------------------------------------------------------
# 2x2 color-decomposed formulation
# ---------------------------------------------------------------------------
#
# The flat kernels above pay a structural 4x: every color pass computes
# resolution + sweep + apply over the FULL grid with a checkerboard mask,
# though only 1/4 of the cells are active.  The reference sidesteps this
# with per-color indirect dispatch (collision_solver.rs submits one
# compute pass per color over that color's cell list); the TPU answer is
# a regular 2x2 space decomposition: interior tiles are split by row/col
# parity into four sub-grids, one per checkerboard color.  A color pass
# then runs on ITS sub-grid only — no mask, 1/4 the lanes — and every
# full-space 3x3 neighbor offset maps to a {-1, 0, +1} offset of one of
# the four sub-grids (still ordinary band halos + lane rolls).  The
# decomposition/recomposition are XLA strided slices outside the kernels
# (one extra pass over the state per frame), so the kernels stay free of
# lane shuffles.  Bit-parity with the flat formulation and the scalar
# model is exact: identical op order, identical selection structure.

_PARS = [(0, 0), (0, 1), (1, 0), (1, 1)]  # (row parity, col parity)


def _color_parity(color: int):
    """color = 1 + ((tx-1)&1) + 2*((ty-1)&1)  ->  (row, col) parity."""
    return ((color - 1) >> 1, (color - 1) & 1)


def _dec_off(p: int, d: int, pc: int) -> int:
    """Decimated-axis offset of the tile at full-space offset ``d`` from a
    parity-``p`` tile, landing on parity ``pc``: (p + d - pc) // 2 with
    pc == (p + d) & 1; always in {-1, 0, +1}."""
    assert pc == (p + d) & 1
    return (p + d - pc) // 2


def _dec_geometry(TY: int, TX: int):
    """Decimated shapes: interior (TY-2, TX-2) padded to even, halved,
    plus a 1-ring border; rows padded to a BAND multiple."""
    TYi, TXi = TY - 2, TX - 2
    TYe, TXe = TYi + (TYi & 1), TXi + (TXi & 1)
    H, W = TYe // 2, TXe // 2
    DX = W + 2
    DYp = -(-(H + 2) // BAND) * BAND
    return TYi, TXi, TYe, TXe, H, W, DYp, DX


def _decompose(a, TY: int, TX: int, fill):
    """Full [C, >=TY, TX] -> {(pa, pb): [C, DYp, DX]} parity sub-grids
    (border ring + row padding hold ``fill``)."""
    TYi, TXi, TYe, TXe, H, W, DYp, DX = _dec_geometry(TY, TX)
    i = a[:, 1:TY - 1, 1:TX - 1]
    i = jnp.pad(i, ((0, 0), (0, TYe - TYi), (0, TXe - TXi)),
                constant_values=fill)
    subs = {}
    for pa, pb in _PARS:
        s = i[:, pa::2, pb::2]
        subs[(pa, pb)] = jnp.pad(
            s, ((0, 0), (1, DYp - H - 1), (1, 1)), constant_values=fill)
    return subs


def _recompose(subs, TY: int, TX: int):
    """Inverse of _decompose (interior values only): -> [C, TYi, TXi]."""
    TYi, TXi, TYe, TXe, H, W, _, _ = _dec_geometry(TY, TX)
    rows = []
    for pa in (0, 1):
        lanes = [subs[(pa, pb)][:, 1:1 + H, 1:1 + W] for pb in (0, 1)]
        rows.append(jnp.stack(lanes, axis=-1).reshape(-1, H, TXe))
    inter = jnp.stack(rows, axis=2).reshape(-1, TYe, TXe)
    return inter[:, :TYi, :TXi]


def _dec_views(rows_by_par, ac: int, bc: int):
    """view[j] = the full-space _OFFS[j] neighbor of a color-(ac, bc)
    cell, as a (banded rows, lane roll) view over the parity sub-grids."""
    views = []
    for (dy, dx) in _OFFS:
        pa, pb = (ac + dy) & 1, (bc + dx) & 1
        oy = _dec_off(ac, dy, pa)
        ox = _dec_off(bc, dx, pb)
        views.append(_lane(rows_by_par[(pa, pb)][oy + 1], ox))
    return views


def _solve_dec_kernel(one_ref, *refs, cap: int, K: int, ac: int, bc: int,
                      stiffness: float, r0=None):
    """Fused resolve + ordered sweep for ONE color on its decimated
    sub-grid (no checkerboard mask — every lane is an active cell).
    With ``r0`` (uniform radius) the rrad table is absent from the call
    and the sweep uses the compile-time constants."""
    one = one_ref[0]
    # refs: per parity x(3), then per parity y(3), then src, rpid[, rrad]
    xr = {p: _rows3(*(r[...] for r in refs[3 * i:3 * i + 3]))
          for i, p in enumerate(_PARS)}
    yr = {p: _rows3(*(r[...] for r in refs[12 + 3 * i:12 + 3 * i + 3]))
          for i, p in enumerate(_PARS)}
    src_v = refs[24][...]
    rpid_v = refs[25][...]
    if r0 is None:
        rrad_v = refs[26][...]
        ux_ref, uy_ref = refs[27], refs[28]
    else:
        ux_ref, uy_ref = refs[26], refs[27]

    band = src_v.shape[1]
    shape1 = (1, band, src_v.shape[2])
    vx = _dec_views(xr, ac, bc)
    vy = _dec_views(yr, ac, bc)

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
        lr.append(None if r0 is not None else rrad_v[q:q + 1])
        lpid.append(rpid_v[q:q + 1])

    active = jnp.full(shape1, True)
    lx, ly = _sweep(lx, ly, lr, lpid, active, jnp.float32(stiffness), one,
                    r0=r0)
    ux_ref[...] = jnp.concatenate(lx, axis=0)
    uy_ref[...] = jnp.concatenate(ly, axis=0)


def _apply_dec_kernel(*refs, cap: int, K: int, ac: int, bc: int):
    """Pull each particle's update from the one color-(ac, bc) cell whose
    rank table names its pid.  A parity-p tile is adjacent to 1, 2 or 4
    cells of a given color (vs 9 masked candidates in the flat kernel)."""
    # refs: ux(3), uy(3), rpid(3), then per parity x, y, pid (mid), then
    # 8 outputs (x, y per parity)
    uxr = _rows3(*(r[...] for r in refs[0:3]))
    uyr = _rows3(*(r[...] for r in refs[3:6]))
    rpr = _rows3(*(r[...] for r in refs[6:9]))
    mids = {p: (refs[9 + 3 * i][...], refs[10 + 3 * i][...],
                refs[11 + 3 * i][...])
            for i, p in enumerate(_PARS)}
    outs = refs[21:]

    for i, (pa, pb) in enumerate(_PARS):
        x_mid, y_mid, pid_mid = mids[(pa, pb)]
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
        outs[2 * i][...] = jnp.concatenate(newx, axis=0)
        outs[2 * i + 1][...] = jnp.concatenate(newy, axis=0)


def gs_solve_pallas_dec(state: TileState, config: SimConfig) -> TileState:
    """Color-decomposed GS solve: rank once in full space, then per color
    a fused resolve+sweep and an apply, both on the color's 2x2-decimated
    sub-grid.  Bit-matches gs_solve_pallas_flat / the scalar model."""
    t, TY, TX = tile_geometry(config)
    cap = state.dims[0]
    K = config.max_occupancy
    TYi, TXi, TYe, TXe, H, W, DYp, DX = _dec_geometry(TY, TX)

    # ---- rank (full space, shared with the flat formulation) ----
    vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    one = jnp.where(state.num_active >= 0, jnp.float32(1.0),
                    jnp.float32(2.0)).reshape((1,))
    _, _, _, src, rpid, rrad, count = _rank_full(
        config, one, state.x, state.y, state.radius, state.pid, cap, K, t)
    overflow = jnp.sum(jnp.maximum(count - K, 0))

    # ---- decompose to parity sub-grids ----
    xs = _decompose(state.x, TY, TX, 0.0)
    ys = _decompose(state.y, TY, TX, 0.0)
    ps = _decompose(state.pid, TY, TX, -1)
    srcs = _decompose(src, TY, TX, -1)
    rpids = _decompose(rpid, TY, TX, _BIGPID)
    rrads = _decompose(rrad, TY, TX, 0.0)

    nb = DYp // BAND

    def mid(i):
        return (0, i, 0)

    def spec3(c):
        def up(i):
            return (0, jnp.maximum(i - 1, 0), 0)

        def dn(i):
            return (0, jnp.minimum(i + 1, nb - 1), 0)
        return [pl.BlockSpec((c, BAND, DX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    def spec1(c):
        return pl.BlockSpec((c, BAND, DX), mid, memory_space=pltpu.VMEM)

    for color in (1, 2, 3, 4):
        ac, bc = _color_parity(color)
        ux, uy = pl.pallas_call(
            partial(_solve_dec_kernel, cap=cap, K=K, ac=ac, bc=bc,
                    stiffness=config.stiffness),
            grid=(nb,),
            in_specs=([smem] + [s for p in _PARS for s in spec3(cap)]
                      + [s for p in _PARS for s in spec3(cap)]
                      + [spec1(K)] * 3),
            out_specs=(spec1(K), spec1(K)),
            out_shape=(_sds((K, DYp, DX), jnp.float32),
                       _sds((K, DYp, DX), jnp.float32)),
            compiler_params=vmem,
            interpret=_interpret(),
        )(one,
          *[b for p in _PARS for b in (xs[p], xs[p], xs[p])],
          *[b for p in _PARS for b in (ys[p], ys[p], ys[p])],
          srcs[(ac, bc)], rpids[(ac, bc)], rrads[(ac, bc)])

        new = pl.pallas_call(
            partial(_apply_dec_kernel, cap=cap, K=K, ac=ac, bc=bc),
            grid=(nb,),
            in_specs=(spec3(K) + spec3(K) + spec3(K)
                      + [spec1(cap)] * 12),
            out_specs=tuple([spec1(cap)] * 8),
            out_shape=tuple(_sds((cap, DYp, DX), jnp.float32)
                            for _ in range(8)),
            compiler_params=vmem,
            interpret=_interpret(),
        )(ux, ux, ux, uy, uy, uy,
          rpids[(ac, bc)], rpids[(ac, bc)], rpids[(ac, bc)],
          *[b for p in _PARS for b in (xs[p], ys[p], ps[p])])
        for i, p in enumerate(_PARS):
            xs[p] = new[2 * i]
            ys[p] = new[2 * i + 1]

    nx = state.x.at[:, 1:TY - 1, 1:TX - 1].set(_recompose(xs, TY, TX))
    ny = state.y.at[:, 1:TY - 1, 1:TX - 1].set(_recompose(ys, TY, TX))
    return dataclasses.replace(
        state, x=nx, y=ny,
        overflow_count=state.overflow_count + overflow)


# ---------------------------------------------------------------------------
# "mx" layout: decomposed kernels + one-hot-MATMUL relayouts
# ---------------------------------------------------------------------------
#
# Same per-color kernels as the "dec" layout, but the parity
# decompose/recompose run as blocked one-hot matmuls on the MXU instead
# of XLA strided slices (measured ~130 ms @1M — strided lane access is
# gather-class on TPU, DESIGN.md §7).  A stride-2 deinterleave of a
# 256-block is a [256, 256] selection matmul whose sources stay inside
# the block, so the whole relayout is reshape + matmul + contiguous
# 128-boundary slicing — every piece is MXU/layout-native.
#
# Bit-exactness does NOT rely on the TPU's f32-matmul internals: every
# 32-bit plane (float or int) is bitcast to u32 and split into two u16
# halves carried as exact f32 values <= 65535 (16 mantissa bits; even
# the bf16x3 default path carries 24).  Each output element of a
# one-hot matmul is then a single exact product, and the halves are
# bitcast back after the relayout — the round trip is bit-faithful for
# ANY 32-bit payload.
#
# Unlike "dec" there is no explicit border ring: the FULL grid (its own
# 1-ring pad border included) is decomposed with sub_p[d] = full[2d + p],
# so the full grid's pad tiles land on the sub-grid edges and play the
# fill role themselves (pad tiles hold pid=-1 / rpid=BIGPID, so their
# lanes compute dead values that the pid-matched apply never takes).
# Lane rolls wrap only for reads FROM those pad lanes.

def _mx_parity(color: int):
    """Full-space (ty & 1, tx & 1) parity of this color's tiles
    (color = 1 + ((tx-1)&1) + 2*((ty-1)&1), gs_tiled.py)."""
    return (1 - ((color - 1) >> 1), 1 - ((color - 1) & 1))


def _mx_blocks(TY: int, TX: int):
    """(row block, col block) for the relayout matmuls.  256 on the lane
    axis = two 128-lane half-blocks per parity (a Mosaic requirement on
    real TPU); the row axis only needs DYp % BAND == 0, i.e. a multiple
    of 16 — adaptive so small worlds don't pad to 256 rows.  Under
    interpret (CPU tests) both axes relax to 16-granular blocks."""
    by = min(256, -(-TY // 16) * 16)
    bx = min(256, -(-TX // 16) * 16) if _interpret() else 256
    return by, bx


def _mx_geometry(TY: int, TX: int):
    """Row/col counts padded to the relayout blocks, and the sub-grid
    shape (half of each padded axis per parity)."""
    by, bx = _mx_blocks(TY, TX)
    TYp = -(-TY // by) * by
    TXp = -(-TX // bx) * bx
    return TYp, TXp, TYp // 2, TXp // 2


def _mx_onehot(b: int = 256):
    """[b, b] selection matrix: column h < b/2 takes source 2h (even
    parity), column h >= b/2 takes source 2(h-b/2)+1 (odd)."""
    import numpy as np
    k = np.arange(b)[:, None]
    h = np.arange(b)[None, :]
    src = np.where(h < b // 2, 2 * h, 2 * (h - b // 2) + 1)
    return jnp.asarray((k == src).astype("float32"))


_HI = jax.lax.Precision.HIGHEST


def _mx_split(a):
    """Any 32-bit [C, R, L] plane -> two exact-f32 u16-half planes."""
    u = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return ((u >> 16).astype(jnp.float32),
            (u & jnp.uint32(0xFFFF)).astype(jnp.float32))


def _mx_merge(hi, lo, dtype):
    u = ((hi.astype(jnp.uint32) << 16)
         | lo.astype(jnp.uint32))
    return jax.lax.bitcast_convert_type(u, dtype)


def _mx_rows_split(a, E):
    """f32 [C, R, L] (R % block == 0) -> (even rows, odd rows)."""
    C, R, L = a.shape
    blk = E.shape[0]
    b = a.reshape(C, R // blk, blk, L)
    o = jnp.einsum("crkl,kh->crhl", b, E, precision=_HI)
    return (o[:, :, :blk // 2].reshape(C, R // 2, L),
            o[:, :, blk // 2:].reshape(C, R // 2, L))


def _mx_cols_split(a, E):
    """f32 [C, R, L] (L % block == 0) -> (even cols, odd cols)."""
    C, R, L = a.shape
    blk = E.shape[0]
    b = a.reshape(C, R, L // blk, blk)
    o = jnp.einsum("crbk,kh->crbh", b, E, precision=_HI)
    return (o[..., :blk // 2].reshape(C, R, L // 2),
            o[..., blk // 2:].reshape(C, R, L // 2))


def _mx_rows_join(e, o, E):
    """Inverse of _mx_rows_split (exact: one-hot rows of E^T)."""
    C, R2, L = e.shape
    h = E.shape[0] // 2
    both = jnp.concatenate(
        [e.reshape(C, R2 // h, h, L), o.reshape(C, R2 // h, h, L)],
        axis=2)
    out = jnp.einsum("crhl,kh->crkl", both, E, precision=_HI)
    return out.reshape(C, R2 * 2, L)


def _mx_cols_join(e, o, E):
    C, R, L2 = e.shape
    h = E.shape[0] // 2
    both = jnp.concatenate(
        [e.reshape(C, R, L2 // h, h), o.reshape(C, R, L2 // h, h)],
        axis=-1)
    out = jnp.einsum("crbh,kh->crbk", both, E, precision=_HI)
    return out.reshape(C, R, L2 * 2)


def _mx_deinterleave(a, Ey, Ex):
    """One padded f32 [C, TYp, TXp] -> the four parity sub-grids."""
    subs = {}
    r0, r1 = _mx_rows_split(a, Ey)
    for pa, rows in ((0, r0), (1, r1)):
        c0, c1 = _mx_cols_split(rows, Ex)
        subs[(pa, 0)] = c0
        subs[(pa, 1)] = c1
    return subs


def _mx_decompose(a, TY: int, TX: int, fill, Ey, Ex, split: bool = True):
    """Full [C, >=TY, TX] -> {(row parity, col parity): [C, TYp/2, TXp/2]}
    via one-hot matmuls; pad rows/cols hold ``fill``.

    ``split=True`` (the safe default) carries every 32-bit plane as two
    exact u16-half f32 planes — bit-faithful independent of the
    hardware's f32-matmul decomposition, NaN payloads included.
    ``split=False`` runs float32 planes through the one-hot matmul
    directly at Precision.HIGHEST (half the matmul work) — FINITE
    values only (0 * NaN = NaN leaks across the one-hot zeros; engine
    positions are finite by invariant), and only after
    scripts/tpu_probe_gsmx.py's raw_f32_onehot_exact check confirms
    bit-exactness on the target hardware.  Integer planes always split
    (bitcast ints can be NaN payloads under f32 arithmetic)."""
    TYp, TXp, _, _ = _mx_geometry(TY, TX)
    a = a[:, :TY]
    a = jnp.pad(a, ((0, 0), (0, TYp - TY), (0, TXp - TX)),
                constant_values=fill)
    if not split and a.dtype == jnp.float32:
        return _mx_deinterleave(a, Ey, Ex)
    subs = {}
    for half in _mx_split(a):
        for p, sub in _mx_deinterleave(half, Ey, Ex).items():
            subs.setdefault(p, []).append(sub)
    return {p: _mx_merge(hi, lo, a.dtype) for p, (hi, lo) in subs.items()}


def _mx_interleave(parts, Ex, Ey):
    rows = [_mx_cols_join(parts[(pa, 0)], parts[(pa, 1)], Ex)
            for pa in (0, 1)]
    return _mx_rows_join(rows[0], rows[1], Ey)


def _mx_recompose(subs, TY: int, TX: int, dtype, Ey, Ex,
                  split: bool = True):
    """Inverse of _mx_decompose -> [C, TY, TX]."""
    if not split and jnp.dtype(dtype) == jnp.float32:
        return _mx_interleave(subs, Ex, Ey)[:, :TY, :TX]
    halves = []
    for idx in range(2):
        parts = {p: _mx_split(subs[p])[idx] for p in _PARS}
        halves.append(_mx_interleave(parts, Ex, Ey))
    return _mx_merge(halves[0], halves[1], dtype)[:, :TY, :TX]


def gs_solve_pallas_mx(state: TileState, config: SimConfig) -> TileState:
    """Color-decomposed GS solve with matmul relayouts: rank once in full
    space, decompose via one-hot MXU matmuls, per color run the same
    fused resolve+sweep and apply kernels as the "dec" layout on the
    color's sub-grid, recompose.  Bit-matches gs_solve_pallas_flat / the
    scalar model.  Phases carry named scopes (gs_rank / gs_relayout /
    gs_color{n}) for utils/profiling traces."""
    t, TY, TX = tile_geometry(config)
    cap = state.dims[0]
    K = config.max_occupancy
    _, _, DYp, DX = _mx_geometry(TY, TX)

    # ---- rank (full space, identical to the flat/dec formulations) ----
    vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    one = jnp.where(state.num_active >= 0, jnp.float32(1.0),
                    jnp.float32(2.0)).reshape((1,))
    with jax.named_scope("gs_rank"):
        _, _, _, src, rpid, rrad, count = _rank_full(
            config, one, state.x, state.y, state.radius, state.pid,
            cap, K, t)
    overflow = jnp.sum(jnp.maximum(count - K, 0))

    # ---- decompose (rank pad rows already hold the fill values) ----
    by, bx = _mx_blocks(TY, TX)
    Ey, Ex = _mx_onehot(by), _mx_onehot(bx)
    sp = config.gs_mx_split
    with jax.named_scope("gs_relayout_in"):
        xs = _mx_decompose(state.x, TY, TX, 0.0, Ey, Ex, split=sp)
        ys = _mx_decompose(state.y, TY, TX, 0.0, Ey, Ex, split=sp)
        ps = _mx_decompose(state.pid, TY, TX, -1, Ey, Ex)
        srcs = _mx_decompose(src, TY, TX, -1, Ey, Ex)
        rpids = _mx_decompose(rpid, TY, TX, _BIGPID, Ey, Ex)
        rrads = _mx_decompose(rrad, TY, TX, 0.0, Ey, Ex, split=sp)

    nb = DYp // BAND

    def mid(i):
        return (0, i, 0)

    def spec3(c):
        def up(i):
            return (0, jnp.maximum(i - 1, 0), 0)

        def dn(i):
            return (0, jnp.minimum(i + 1, nb - 1), 0)
        return [pl.BlockSpec((c, BAND, DX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    def spec1(c):
        return pl.BlockSpec((c, BAND, DX), mid, memory_space=pltpu.VMEM)

    for color in (1, 2, 3, 4):
        ac, bc = _mx_parity(color)
        with jax.named_scope(f"gs_color{color}"):
            ux, uy = pl.pallas_call(
                partial(_solve_dec_kernel, cap=cap, K=K, ac=ac, bc=bc,
                        stiffness=config.stiffness),
                grid=(nb,),
                in_specs=([smem] + [s for p in _PARS for s in spec3(cap)]
                          + [s for p in _PARS for s in spec3(cap)]
                          + [spec1(K)] * 3),
                out_specs=(spec1(K), spec1(K)),
                out_shape=(_sds((K, DYp, DX), jnp.float32),
                           _sds((K, DYp, DX), jnp.float32)),
                compiler_params=vmem,
                interpret=_interpret(),
            )(one,
              *[b for p in _PARS for b in (xs[p], xs[p], xs[p])],
              *[b for p in _PARS for b in (ys[p], ys[p], ys[p])],
              srcs[(ac, bc)], rpids[(ac, bc)], rrads[(ac, bc)])

            new = pl.pallas_call(
                partial(_apply_dec_kernel, cap=cap, K=K, ac=ac, bc=bc),
                grid=(nb,),
                in_specs=(spec3(K) + spec3(K) + spec3(K)
                          + [spec1(cap)] * 12),
                out_specs=tuple([spec1(cap)] * 8),
                out_shape=tuple(_sds((cap, DYp, DX), jnp.float32)
                                for _ in range(8)),
                compiler_params=vmem,
                interpret=_interpret(),
            )(ux, ux, ux, uy, uy, uy,
              rpids[(ac, bc)], rpids[(ac, bc)], rpids[(ac, bc)],
              *[b for p in _PARS for b in (xs[p], ys[p], ps[p])])
        for i, p in enumerate(_PARS):
            xs[p] = new[2 * i]
            ys[p] = new[2 * i + 1]

    with jax.named_scope("gs_relayout_out"):
        nx = _mx_recompose(xs, TY, TX, jnp.float32, Ey, Ex, split=sp)
        ny = _mx_recompose(ys, TY, TX, jnp.float32, Ey, Ex, split=sp)
    return dataclasses.replace(
        state, x=nx, y=ny,
        overflow_count=state.overflow_count + overflow)
