"""Persistent tiled engine: sort-free broad phase on dense tile storage.

The measured wall for every sort-based pipeline on TPU is `lax.sort` at
~4 GB/s (DESIGN.md §6-7).  This pipeline removes the per-step global sort
entirely by making spatial binning *persistent state* instead of a per-step
product — the TPU answer to the reference's "rebuild the grid every frame"
(grid.rs:322-332), exploiting that particles move a tiny fraction of a tile
per step:

  * Storage IS the grid: every per-particle field lives in a dense
    [CAP, TY, TX] array — slot k of tile (ty, tx).  Slot-major layout keeps
    the large TX extent in the lane dimension (TPU tiles (8, 128); a
    trailing CAP~16 would waste 7/8 of every vector).
  * Collisions: for each of the 9 neighbor offsets and CAP partner slots, a
    vectorized pair interaction against all local slots — pure elementwise
    math on shifted slices; each side accumulates its own half (Jacobi).
    No scatter, no gather, no sort.
  * Integration: elementwise over slots.
  * Relocation: the few particles that crossed a tile boundary this step
    (~0.1%) are compacted into a small fixed buffer, claim free slots in
    their new tile with deterministic scatter-min rounds, and only then
    vacate their old slots.  A mover that finds no slot (or overflows the
    buffer) stays put and retries next step — never lost, and counted in
    ``overflow_count``.

Geometry: tile edge T = tile_multiplier * tile_max_radius with
T >= 2*max_radius + slack, so all interacting pairs lie within the 3x3
neighborhood even for particles whose relocation was deferred a step.  A
one-tile empty border ring absorbs shifted reads at the world edge (and
makes `jnp.roll` wrap-around read vacant slots).

Semantic note vs the reference: pair discovery is exact (same pair set);
corrections apply once per pair per substep, simultaneously — the Jacobi
variant of the reference's per-shared-cell Gauss-Seidel projection
(collision_solver.wgsl:66-118).  solver="colored" remains the bit-parity
path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import StepParams

_I32 = jnp.int32
MIN_DISTANCE = 1e-4  # collision_solver.wgsl:95
# plain ints: module-level jnp constants would initialize the backend at import
_EMPTY = -1
_BIG = 0x7FFFFFFF


# ---------------------------------------------------------------------------
# geometry + state
# ---------------------------------------------------------------------------

def tile_geometry(config: SimConfig) -> Tuple[float, int, int]:
    """(tile_edge, TY, TX) including the 1-tile empty border ring.

    TY is rounded up to a multiple of 8 (the f32 sublane tile) so the
    Pallas band collide kernel's row bands divide the grid evenly; the
    extra rows sit above the world and stay empty like the border ring.
    """
    t = config.tile_multiplier * config.tile_max_radius_effective
    tx = int(math.ceil(config.world_width / t)) + 2
    ty = int(math.ceil(config.world_height / t)) + 2
    return t, -(-ty // 8) * 8, tx


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "px", "py", "radius", "pid",
                 "num_active", "overflow_count"],
    meta_fields=[],
)
@dataclasses.dataclass
class TileState:
    """Dense tile-resident particle state ([CAP, TY, TX] per field)."""
    x: jax.Array
    y: jax.Array
    px: jax.Array
    py: jax.Array
    radius: jax.Array
    pid: jax.Array          # i32, -1 marks an empty slot
    num_active: jax.Array   # i32[]
    overflow_count: jax.Array  # i32[] deferred movers + refused inserts

    @property
    def dims(self):
        return self.x.shape  # (CAP, TY, TX)

    def occupied(self):
        return self.pid >= 0


def _tile_of(x, y, tile_edge):
    """Tile coords (+1 border offset) of world positions."""
    tx = jnp.floor(x / tile_edge).astype(_I32) + 1
    ty = jnp.floor(y / tile_edge).astype(_I32) + 1
    return ty, tx


def _load_native_tiler():
    """ctypes handle to the C++ binning pass (native/tiler.cpp), or None."""
    global _TILER, _TILER_FAILED
    if _TILER is not None or _TILER_FAILED:
        return _TILER
    import ctypes
    import os
    import subprocess

    import numpy as np

    native_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                              "native")
    lib_path = os.path.join(native_dir, "libtiler.so")
    try:
        # Always run make: its own mtime check makes this a no-op when the
        # .so is fresh, and it rebuilds when tiler.cpp changed (a stale
        # prebuilt .so would silently diverge from the numpy fallback).
        subprocess.run(["make", "-s", "-C", native_dir], check=True,
                       capture_output=True)
        lib = ctypes.CDLL(lib_path)
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.bin_particles.argtypes = [
            f32, f32, f32, i32, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32, f32, f32, f32, f32, i32, i32]
        lib.bin_particles.restype = ctypes.c_int64
        _TILER = lib
    except Exception:
        _TILER_FAILED = True
    return _TILER


_TILER = None
_TILER_FAILED = False


def init_tiles(config: SimConfig, positions, radii, pids=None,
               previous_positions=None) -> TileState:
    """Host-side construction from particle arrays (init / test fixture).

    Uses the native C++ binning pass (native/tiler.cpp) when available —
    the framework's data-loader, memory-speed at 16M particles — with a
    vectorized numpy fallback."""
    import numpy as np

    t, TY, TX = tile_geometry(config)
    cap = config.tile_cap
    positions = np.ascontiguousarray(positions, np.float32).reshape(-1, 2)
    radii = np.ascontiguousarray(radii, np.float32).reshape(-1)
    n = radii.shape[0]
    if n and float(radii.max()) * 2.0 > t:
        raise ValueError(
            f"tile edge {t:.3f} < particle diameter {2 * radii.max():.3f}: "
            "the 3x3 neighborhood would miss pairs. Raise "
            "SimConfig.tile_max_radius (or tile_multiplier).")
    if previous_positions is None:
        previous_positions = positions
    previous_positions = np.ascontiguousarray(
        previous_positions, np.float32).reshape(-1, 2)
    if pids is None:
        pids = np.arange(n, dtype=np.int32)
    pids = np.ascontiguousarray(pids, np.int32)

    shape = (cap, TY, TX)
    size = cap * TY * TX

    lib = _load_native_tiler()
    if lib is not None:
        fx = np.zeros(size, np.float32)
        fy = np.zeros(size, np.float32)
        fpx = np.zeros(size, np.float32)
        fpy = np.zeros(size, np.float32)
        fr = np.zeros(size, np.float32)
        fpid = np.full(size, -1, np.int32)
        fill = np.zeros(TY * TX, np.int32)
        dropped = int(lib.bin_particles(
            positions, previous_positions, radii, pids, n, np.float32(t),
            cap, TY, TX, fx, fy, fpx, fpy, fr, fpid, fill))
        return TileState(
            x=jnp.asarray(fx.reshape(shape)), y=jnp.asarray(fy.reshape(shape)),
            px=jnp.asarray(fpx.reshape(shape)),
            py=jnp.asarray(fpy.reshape(shape)),
            radius=jnp.asarray(fr.reshape(shape)),
            pid=jnp.asarray(fpid.reshape(shape)),
            num_active=jnp.int32(n - dropped),
            overflow_count=jnp.int32(dropped),
        )

    # numpy fallback: stable sort by tile, slot = rank within run; then
    # spill overflow to nearby tiles in ascending particle order — the
    # EXACT layout of the native path (natives first, spills second).
    # Rings widen as far as the grid (placement guaranteed while total
    # slots >= n): a checkpoint of a compressed scene can hold more
    # particles near one tile than cap*5x5 — conservation first, far
    # spills are stale-but-recoverable (relocate sweep + watchdog)
    ty = np.clip((positions[:, 1] // t).astype(np.int64) + 1, 1, TY - 2)
    tx = np.clip((positions[:, 0] // t).astype(np.int64) + 1, 1, TX - 2)
    tile = ty * TX + tx
    order = np.argsort(tile, kind="stable")
    tile_sorted = tile[order]
    first = np.concatenate([[0], np.nonzero(np.diff(tile_sorted))[0] + 1])
    run_start = np.zeros(n, np.int64)
    run_start[first] = first
    run_start = np.maximum.accumulate(run_start)
    slot = np.arange(n, dtype=np.int64) - run_start

    keep = slot < cap
    flat = list(slot[keep] * (TY * TX) + tile_sorted[keep])
    src = list(order[keep])

    fill = np.bincount(tile, minlength=TY * TX)
    np.minimum(fill, cap, out=fill)
    dropped = 0
    for i in np.sort(order[~keep]):  # ascending particle order
        dest = -1
        for ring in range(1, max(TY, TX)):
            for dy in range(-ring, ring + 1):
                for dx in range(-ring, ring + 1):
                    if max(abs(dy), abs(dx)) != ring:
                        continue  # ring boundary only
                    sy, sx = ty[i] + dy, tx[i] + dx
                    if not (1 <= sy <= TY - 2 and 1 <= sx <= TX - 2):
                        continue
                    cand = sy * TX + sx
                    if fill[cand] < cap:
                        dest = cand
                        break
                if dest >= 0:
                    break
            if dest >= 0:
                break
        if dest < 0:
            dropped += 1
            continue
        flat.append(fill[dest] * (TY * TX) + dest)
        src.append(i)
        fill[dest] += 1
    flat = np.asarray(flat, np.int64)
    src = np.asarray(src, np.int64)

    def place(vals, fill=0.0, dtype=np.float32):
        a = np.full(size, fill, dtype)
        a[flat] = vals[src]
        return jnp.asarray(a.reshape(shape))

    return TileState(
        x=place(positions[:, 0]), y=place(positions[:, 1]),
        px=place(previous_positions[:, 0]), py=place(previous_positions[:, 1]),
        radius=place(radii),
        pid=place(pids, fill=-1, dtype=np.int32),
        num_active=jnp.int32(n - dropped),
        overflow_count=jnp.int32(dropped),
    )


def stale_pair_fraction(state: TileState, config: SimConfig):
    """Fraction of particles whose storage tile is >= 2 tiles (Chebyshev)
    from their home tile — THE physics-quality bound for the persistent
    tiled pipeline: the collide kernels' 3x3 window keeps a particle's
    pair set exact up to ONE tile of storage displacement (hysteresis
    dancers and one-hop-lagged movers are safe); only the >= 2 population
    can miss collisions.  The deferred-population counter
    (overflow_count deltas) over-reads quality loss: it also counts
    benign in-band dancers and the relocation latency of granular
    CLUSTERING (dissipative scenes cool and clump — real physics that
    slowly fills storage locally; measured: 512k's deferred population
    grows to ~5%% while the stale-pair fraction stays ~0.4%%,
    scripts/tpu_probe_dilute_diag.py).  Jittable; returns an f32 scalar.
    """
    t, TY, TX = tile_geometry(config)
    occ = state.occupied()
    ty_now = jax.lax.broadcasted_iota(_I32, state.x.shape, 1)
    tx_now = jax.lax.broadcasted_iota(_I32, state.x.shape, 2)
    tyw = jnp.clip(jnp.floor(state.y / jnp.float32(t)).astype(_I32) + 1,
                   1, TY - 2)
    txw = jnp.clip(jnp.floor(state.x / jnp.float32(t)).astype(_I32) + 1,
                   1, TX - 2)
    d = jnp.maximum(jnp.abs(tyw - ty_now), jnp.abs(txw - tx_now))
    stale = jnp.sum((d >= 2) & occ)
    return stale.astype(jnp.float32) / jnp.maximum(state.num_active, 1)


def displaced_fraction(state: TileState, config: SimConfig):
    """Fraction of particles stored >= 1 tile from their home tile — the
    deferred POPULATION the storage-jam watchdog tracks (DESIGN.md §9:
    at a jam-prone geometry this grows without bound long-horizon; at a
    healthy one it plateaus at the hysteresis-dancer level).  Unlike the
    overflow_count event counter this is an absolute occupancy of the
    displaced class, so a watchdog can compare it across windows without
    integrating rates.  Jittable; returns an f32 scalar."""
    t, TY, TX = tile_geometry(config)
    occ = state.occupied()
    ty_now = jax.lax.broadcasted_iota(_I32, state.x.shape, 1)
    tx_now = jax.lax.broadcasted_iota(_I32, state.x.shape, 2)
    tyw = jnp.clip(jnp.floor(state.y / jnp.float32(t)).astype(_I32) + 1,
                   1, TY - 2)
    txw = jnp.clip(jnp.floor(state.x / jnp.float32(t)).astype(_I32) + 1,
                   1, TX - 2)
    d = jnp.maximum(jnp.abs(tyw - ty_now), jnp.abs(txw - tx_now))
    disp = jnp.sum((d >= 1) & occ)
    return disp.astype(jnp.float32) / jnp.maximum(state.num_active, 1)


def export_particles(state: TileState):
    """Host download: (pid, positions, previous_positions, radii) of live
    slots, sorted by pid (the GpuBuffer::download analog)."""
    import numpy as np

    occ = np.asarray(state.pid) >= 0
    pid = np.asarray(state.pid)[occ]
    order = np.argsort(pid)
    pos = np.stack([np.asarray(state.x)[occ], np.asarray(state.y)[occ]], -1)
    prev = np.stack([np.asarray(state.px)[occ], np.asarray(state.py)[occ]], -1)
    rad = np.asarray(state.radius)[occ]
    return pid[order], pos[order], prev[order], rad[order]


# ---------------------------------------------------------------------------
# collision: 3x3 shifted-window Jacobi pair sweep
# ---------------------------------------------------------------------------

def _shift_tiles(a, dy: int, dx: int):
    """Neighbor tile view: a[:, ty+dy, tx+dx]. The empty border ring makes
    the wrap-around rows/cols read as vacant slots."""
    if dy == 0 and dx == 0:
        return a
    return jnp.roll(a, shift=(-dy, -dx), axis=(1, 2))


def collide(state: TileState, config: SimConfig) -> TileState:
    """One Jacobi relaxation over all pairs in the 3x3 tile neighborhoods."""
    cap = state.dims[0]
    stiffness = jnp.float32(config.stiffness)
    occf = state.occupied().astype(jnp.float32)

    x, y, r = state.x, state.y, state.radius
    acc_x = jnp.zeros_like(x)
    acc_y = jnp.zeros_like(y)

    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xo = _shift_tiles(x, dy, dx)
            yo = _shift_tiles(y, dy, dx)
            ro = _shift_tiles(r, dy, dx)
            occo = _shift_tiles(occf, dy, dx)
            self_tile = dy == 0 and dx == 0
            for k in range(cap):
                xk = xo[k][None]   # [1, TY, TX] broadcasts over my slots
                yk = yo[k][None]
                rk = ro[k][None]
                ok = occo[k][None]

                # rsqrt formulation (no sqrt/div — they dominate the VPU
                # cost of the sweep): dist = d2*rsqrt(d2), 1/rsum =
                # rsqrt(rsum^2); same pair set and projection as
                # collision_solver.wgsl:60-118
                ddx = x - xk
                ddy = y - yk
                d2 = ddx * ddx + ddy * ddy
                rsum = r + rk
                rsum2 = rsum * rsum
                pair = ((rsum2 > d2)
                        & (d2 > MIN_DISTANCE * MIN_DISTANCE)
                        ).astype(jnp.float32)
                if self_tile:
                    pair = pair * (1.0 - jax.nn.one_hot(
                        k, cap, dtype=jnp.float32)[:, None, None])
                w = pair * occf * ok
                inv = jax.lax.rsqrt(
                    jnp.maximum(d2, MIN_DISTANCE * MIN_DISTANCE))
                dist = d2 * inv
                pen = (rsum - dist) * stiffness
                # my half of the pair correction (inverse-mass split,
                # collision_solver.wgsl:101-110): wi = rk / rsum
                wi = rk * jax.lax.rsqrt(
                    jnp.maximum(rsum2, MIN_DISTANCE * MIN_DISTANCE))
                coef = inv * pen * wi * w
                acc_x = acc_x + ddx * coef
                acc_y = acc_y + ddy * coef

    return dataclasses.replace(state, x=x + acc_x, y=y + acc_y)


# ---------------------------------------------------------------------------
# integration (same math as ops/integrate.py, over tile slots)
# ---------------------------------------------------------------------------

def integrate(state: TileState, params: StepParams, config: SimConfig,
              dt_scale: float = 1.0) -> TileState:
    occ = state.occupied()
    vel_x = state.x - state.px
    vel_y = state.y - state.py

    gx = jnp.float32(config.gravity[0])
    gy = jnp.float32(config.gravity[1])
    dxm = params.mouse_x - state.x
    dym = params.mouse_y - state.y
    dist = jnp.sqrt(dxm * dxm + dym * dym)
    inv = jnp.where(dist > 1e-6, 1.0 / jnp.maximum(dist, 1e-6), 0.0)
    strength = jnp.float32(config.mouse_strength) * params.mouse_pressed
    ax = gx + dxm * inv * strength
    ay = gy + dym * inv * strength

    dt = params.dt * jnp.float32(dt_scale)
    dt2 = dt * dt
    nx = state.x + vel_x + ax * dt2
    ny = state.y + vel_y + ay * dt2
    from gpu_physics_engine_tpu.ops.integrate import apply_world_constraint
    nx, ny = apply_world_constraint(nx, ny, state.radius, config)

    return dataclasses.replace(
        state,
        x=jnp.where(occ, nx, state.x),
        y=jnp.where(occ, ny, state.y),
        px=jnp.where(occ, state.x, state.px),
        py=jnp.where(occ, state.y, state.py),
    )


# ---------------------------------------------------------------------------
# relocation: compact movers -> claim free slots -> move
# ---------------------------------------------------------------------------

def _insert_compacted(state: TileState, ty_t, tx_t, fields, live):
    """Claim free slots in target tiles for up to M compacted entries.

    fields = (x, y, px, py, radius, pid), each [M].  Deterministic: per
    claim round the lowest entry index wins a tile's free slot k.  Returns
    (new state, placed mask).  All scatters are small ([M] updates) and
    unique; tile arrays are updated through their flat [CAP*TY*TX] views.
    """
    cap, TY, TX = state.dims
    ntiles = TY * TX
    m = ty_t.shape[0]
    tile_lin = ty_t * TX + tx_t
    enc = jnp.arange(m, dtype=_I32)

    flat = [a.reshape(-1) for a in
            (state.x, state.y, state.px, state.py, state.radius)]
    pid_flat = state.pid.reshape(-1)
    placed = ~live

    for k in range(cap):
        base = k * ntiles
        can = ~placed & (pid_flat[base + tile_lin] < 0)
        claim = jnp.full(ntiles + 1, _BIG, _I32)
        claim = claim.at[jnp.where(can, tile_lin, ntiles)].min(
            jnp.where(can, enc, _BIG), mode="drop")
        won = can & (claim[tile_lin] == enc)

        # losers get DISTINCT out-of-bounds destinations: unique_indices
        # must hold even for dropped entries
        dst = jnp.where(won, base + tile_lin, cap * ntiles + enc)
        for i in range(5):
            flat[i] = flat[i].at[dst].set(
                fields[i], mode="drop", unique_indices=True)
        pid_flat = pid_flat.at[dst].set(
            fields[5], mode="drop", unique_indices=True)
        placed = placed | won

    shape = state.dims
    new_state = dataclasses.replace(
        state,
        x=flat[0].reshape(shape), y=flat[1].reshape(shape),
        px=flat[2].reshape(shape), py=flat[3].reshape(shape),
        radius=flat[4].reshape(shape), pid=pid_flat.reshape(shape))
    return new_state, placed & live


def relocate(state: TileState, config: SimConfig, m_cap: int | None = None,
             tile_offset=None, delta: float = 0.0) -> TileState:
    """Move boundary-crossing particles to their new tiles (deferred-safe).

    ``m_cap`` overrides config.mover_capacity (the periodic exact sweep
    passes its own budget — see SimConfig.sweep_mover_capacity).
    ``tile_offset`` (traced i32 scalar) rotates the mover-tile scan
    start: the buffer-overflow compaction takes a PREFIX of flat tile
    order, so a fixed start systematically starves high-index tiles
    across repeated overflowing calls — the sweep rotates it.
    ``delta`` > 0 applies the pull relocate's hysteresis band to the
    MOVER TEST: particles within ``delta`` world units of their storage
    tile's boundary are left in place (they are pair-set-safe where
    they are — tiled_pallas._step_offsets semantics).  The sweep passes
    config.hysteresis_delta so it only handles the genuinely displaced
    population, keeping the per-sweep mover count (and therefore the
    buffer and the sweep cost) small enough to run at a short cadence —
    the 4M-density jam fix (PERF.md '4M storage-jam')."""
    t, TY, TX = tile_geometry(config)
    if m_cap is None:
        m_cap = config.mover_capacity

    occ = state.occupied()
    ty_now = jax.lax.broadcasted_iota(_I32, state.x.shape, 1)
    tx_now = jax.lax.broadcasted_iota(_I32, state.x.shape, 2)
    ty_want, tx_want = _tile_of(state.x, state.y, jnp.float32(t))
    ty_want = jnp.clip(ty_want, 1, TY - 2)
    tx_want = jnp.clip(tx_want, 1, TX - 2)
    if delta:
        # hysteresis band (one-hop form of tiled_pallas._step_offsets):
        # crossed only once at least delta past the storage boundary
        tf = jnp.float32(t)
        d = jnp.float32(delta)
        dty = ((state.y >= ty_now.astype(jnp.float32) * tf + d)
               .astype(_I32)
               - (state.y < (ty_now - 1).astype(jnp.float32) * tf - d)
               .astype(_I32))
        dtx = ((state.x >= tx_now.astype(jnp.float32) * tf + d)
               .astype(_I32)
               - (state.x < (tx_now - 1).astype(jnp.float32) * tf - d)
               .astype(_I32))
        mover = occ & ((dty != 0) | (dtx != 0))
    else:
        mover = occ & ((ty_want != ty_now) | (tx_want != tx_now))

    cap, TY, TX = state.dims
    ntiles = TY * TX
    size = cap * ntiles
    flat_mask = mover.reshape(-1)
    n_movers = jnp.sum(flat_mask.astype(_I32))

    # Two-level mover compaction: a full-size nonzero is a cumsum over all
    # slots (expensive at 16M); instead flag tiles containing movers (~0.1%
    # of tiles), compact the FLAGS, and expand each flagged tile's CAP
    # slots.  All heavy ops shrink to the tile count or the small buffer.
    mt_cap = max(1, m_cap // cap)
    tile_mask = jnp.any(mover, axis=0).reshape(-1)          # [ntiles]
    if tile_offset is not None:
        off = jnp.asarray(tile_offset, _I32) % ntiles
        tile_mask = jnp.roll(tile_mask, -off)
    (tile_idx,) = jnp.nonzero(tile_mask, size=mt_cap, fill_value=ntiles)
    tile_live = tile_idx < ntiles
    if tile_offset is not None:
        tile_idx = jnp.where(tile_live, (tile_idx + off) % ntiles, ntiles)
    tile_idx = jnp.where(tile_live, tile_idx, 0)
    # expand: slot-major flat indices of every slot in the flagged tiles
    mov_idx = (jnp.arange(cap, dtype=_I32)[:, None] * ntiles
               + tile_idx[None, :]).reshape(-1)             # [cap * mt_cap]
    live = (jnp.broadcast_to(tile_live[None, :], (cap, mt_cap)).reshape(-1)
            & flat_mask[mov_idx])
    mov_idx = jnp.where(live, mov_idx, 0)

    def take(a, fill):
        v = a.reshape(-1)[mov_idx]
        return jnp.where(live, v, jnp.asarray(fill, v.dtype))

    fields = (take(state.x, 0), take(state.y, 0),
              take(state.px, 0), take(state.py, 0),
              take(state.radius, 0), take(state.pid, -1))
    ty_t = take(ty_want, 0)
    tx_t = take(tx_want, 0)
    # movers beyond the buffer are deferred to the next step (safe: the 3x3
    # neighborhood still covers a one-step-stale tile; never silent)
    deferred = n_movers - jnp.sum(live.astype(_I32))

    new_state, placed = _insert_compacted(state, ty_t, tx_t, fields, live)
    # vacate PLACED movers' old slots (distinct OOB indices for the rest)
    rm = jnp.where(placed, mov_idx,
                   size + jnp.arange(mov_idx.shape[0], dtype=_I32))
    pid_flat = new_state.pid.reshape(-1)
    pid_flat = pid_flat.at[rm].set(_EMPTY, mode="drop", unique_indices=True)
    not_placed = jnp.sum((live & ~placed).astype(_I32))
    return dataclasses.replace(
        new_state, pid=pid_flat.reshape(state.pid.shape),
        overflow_count=state.overflow_count + deferred + not_placed)


def _home_lin(state: TileState, config: SimConfig):
    """(live, lin): flat [S] home-tile linear index with a dead-slot
    sentinel of ntiles — the shared prologue of rebuild and
    rebuild_gather (the 1..TY-2 / 1..TX-2 clip bound is the init
    tiler's; keep the two flavors bit-identical by construction)."""
    t, TY, TX = tile_geometry(config)
    live = state.occupied()
    ty_w, tx_w = _tile_of(state.x, state.y, jnp.float32(t))
    ty_w = jnp.clip(ty_w, 1, TY - 2)
    tx_w = jnp.clip(tx_w, 1, TX - 2)
    return live, jnp.where(live, ty_w * TX + tx_w, TY * TX).reshape(-1)


def _group_rank(key_sorted):
    """Rank of each entry within its equal-key group, for an ascending
    stably-sorted key vector: a max-scan over group-start indices
    (shared by rebuild and rebuild_band)."""
    n = key_sorted.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]])
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, 0))
    return idx - start


def rebuild(state: TileState, config: SimConfig,
            loser_cap: int = 1 << 16) -> TileState:
    """Wholesale storage rebuild: every live particle re-slotted at its
    HOME tile in one stable sort — the device-side analog of the
    reference's rebuilt-every-frame grid (grid.rs:322-332) and the
    exact sweep ``relocate`` structurally cannot be: relocate's
    free-slot claims can never resolve displacement CHAINS across full
    tiles (A -> B while B's slots hold movers headed elsewhere), so at
    4M/103% area fill the stale population compounds at ANY sweep
    cadence or cap (measured: tpu_probe_gs4m_cadence.jsonl — cadence
    240/120/60 all creep 5 -> 10% identically, cap6 == cap7).

    Mechanics (sort-speed, no large gathers):
      1. stable lax.sort of the full [CAP*TY*TX] slot array by home
         tile (dead slots to the end),
      2. rank-within-home-group via a max-scan over group starts,
      3. winners (rank < CAP) scatter to (rank, home) — unique indices,
      4. losers (home demand exceeded CAP) go to global free slots via
         a bounded zip (never silently lost; anything past loser_cap —
         pathological demand — is counted in overflow_count and
         num_active drops, same contract as init_tiles refusals).

    Slot ORDER within a tile is not preserved; all consumers key on
    pid, not slot (the GS rank tables are pid-sorted selection
    networks, the Jacobi sweep is order-free), and relocate/collide
    read slots symmetrically.
    """
    t, TY, TX = tile_geometry(config)
    cap, _, _ = state.dims
    ntiles = TY * TX
    S = cap * ntiles

    live, lin = _home_lin(state, config)

    key, xs, ys, pxs, pys, rs, ps = jax.lax.sort(
        (lin, state.x.reshape(-1), state.y.reshape(-1),
         state.px.reshape(-1), state.py.reshape(-1),
         state.radius.reshape(-1), state.pid.reshape(-1)),
        num_keys=1, is_stable=True)

    rank = _group_rank(key)
    in_grid = key < ntiles
    win = in_grid & (rank < cap)
    dst = jnp.where(win, rank * ntiles + key, S)

    def fresh(fill, dtype, vals):
        return jnp.full(S, fill, dtype).at[dst].set(
            vals, mode="drop", unique_indices=True)

    nx = fresh(0.0, jnp.float32, xs)
    ny = fresh(0.0, jnp.float32, ys)
    npx = fresh(0.0, jnp.float32, pxs)
    npy = fresh(0.0, jnp.float32, pys)
    nr = fresh(0.0, jnp.float32, rs)
    npid = fresh(_EMPTY, _I32, ps)

    # losers: home demand exceeded CAP — zip into global free slots
    loser = in_grid & (rank >= cap)
    n_losers = jnp.sum(loser.astype(_I32))
    (lidx,) = jnp.nonzero(loser, size=loser_cap, fill_value=S)
    l_live = lidx < S
    lidx0 = jnp.where(l_live, lidx, 0)
    (fidx,) = jnp.nonzero(npid < 0, size=loser_cap, fill_value=S)
    # a loser needs a live free slot; free slots are plentiful
    # (S >> num_active) so fidx exhaustion implies lidx exhaustion
    ldst = jnp.where(l_live & (fidx < S), fidx, S)
    nx = nx.at[ldst].set(xs[lidx0], mode="drop", unique_indices=True)
    ny = ny.at[ldst].set(ys[lidx0], mode="drop", unique_indices=True)
    npx = npx.at[ldst].set(pxs[lidx0], mode="drop", unique_indices=True)
    npy = npy.at[ldst].set(pys[lidx0], mode="drop", unique_indices=True)
    nr = nr.at[ldst].set(rs[lidx0], mode="drop", unique_indices=True)
    npid = npid.at[ldst].set(ps[lidx0], mode="drop", unique_indices=True)

    placed_losers = jnp.sum((ldst < S).astype(_I32))
    lost = n_losers - placed_losers  # pathological (> loser_cap): loud
    shape = state.dims
    return dataclasses.replace(
        state,
        x=nx.reshape(shape), y=ny.reshape(shape),
        px=npx.reshape(shape), py=npy.reshape(shape),
        radius=nr.reshape(shape), pid=npid.reshape(shape),
        num_active=state.num_active - lost,
        overflow_count=state.overflow_count + lost)


def rebuild_gather(state: TileState, config: SimConfig,
                   loser_cap: int = 1 << 16) -> TileState:
    """``rebuild`` with a 2-payload sort + per-plane gathers instead of
    the 7-payload value sort — SAME placement, bit-identical output
    (the stable (key, source-index) sort induces the identical
    permutation the value sort applies directly).

    Why it exists: the monolithic ``rebuild`` program never compiled
    at the 2.65M-cell / 16M-slot 4M-GS geometry (81-minute compile
    ERROR after five attempts — docs/probes_r4/
    tpu_probe_gs_rebuild.jsonl), and round 5 measured the structural
    consequence: the production gs_4m config rides stale storage from
    5% to 91% over 21k steps with a forced claim sweep at EVERY
    boundary (docs/probes_r5/tpu_probe_gs4m_contain.jsonl) — nothing
    short of a true wholesale re-slot can hold 103% fill.  The
    7-payload bitonic sort at 16M slots is the monolith's dominant
    graph; sorting only (key, src) and moving the six planes by
    gather shrinks the program the compile service must swallow.
    Gathers run ~1 GB/s on TPU (DESIGN.md §7) — ~64 ms/plane at 16M.
    Select via SimConfig.tiled_rebuild_impl="gather".

    VERDICT (round 5): the smaller graph did NOT save it — this
    flavor's compile ALSO black-holed at the 16M-slot GS geometry
    (>95 min frozen IO while a concurrent tiny ping compiled in
    1.4 s; docs/probes_r5/tpu_probe_gs_rebuild_gather.jsonl).  The
    compile-service failure is the geometry/op-scale class, not the
    payload count.  Do not re-queue it there without new evidence; it
    remains a valid (bit-identical) flavor wherever rebuild compiles.
    """
    t, TY, TX = tile_geometry(config)
    cap, _, _ = state.dims
    ntiles = TY * TX
    S = cap * ntiles

    live, lin = _home_lin(state, config)

    src = jnp.arange(S, dtype=_I32)
    key, src_s = jax.lax.sort((lin, src), num_keys=1, is_stable=True)
    rank = _group_rank(key)
    in_grid = key < ntiles
    win = in_grid & (rank < cap)
    dst = jnp.where(win, rank * ntiles + key, S)

    # losers: home demand exceeded CAP — zip into global free slots.
    # Free slots of the REBUILT layout: a destination (k, home) is
    # occupied iff home's demand reaches past rank k, computable
    # without materializing npid: demand[home] = group size.
    demand = jnp.zeros(ntiles + 1, _I32).at[key].add(
        jnp.ones_like(key), mode="drop")
    loser = in_grid & (rank >= cap)
    n_losers = jnp.sum(loser.astype(_I32))
    (lidx,) = jnp.nonzero(loser, size=loser_cap, fill_value=S)
    l_live = lidx < S
    # free slot (k, tile) <=> demand[tile] <= k: enumerate per k-plane
    free_flat = (jnp.broadcast_to(demand[None, :ntiles], (cap, ntiles))
                 <= jnp.arange(cap, dtype=_I32)[:, None]).reshape(-1)
    (fidx,) = jnp.nonzero(free_flat, size=loser_cap, fill_value=S)
    ldst = jnp.where(l_live & (fidx < S), fidx, S)
    placed_losers = jnp.sum((ldst < S).astype(_I32))
    lost = n_losers - placed_losers

    lsrc = jnp.where(l_live, src_s[jnp.where(l_live, lidx, 0)], 0)
    src_g = jnp.where(win, src_s, 0)

    def moved(plane, fill, dtype):
        flat = plane.reshape(-1)
        out = jnp.full(S, fill, dtype).at[dst].set(
            flat[src_g], mode="drop", unique_indices=True)
        return out.at[ldst].set(flat[lsrc], mode="drop",
                                unique_indices=True)

    shape = state.dims
    return dataclasses.replace(
        state,
        x=moved(state.x, 0.0, jnp.float32).reshape(shape),
        y=moved(state.y, 0.0, jnp.float32).reshape(shape),
        px=moved(state.px, 0.0, jnp.float32).reshape(shape),
        py=moved(state.py, 0.0, jnp.float32).reshape(shape),
        radius=moved(state.radius, 0.0, jnp.float32).reshape(shape),
        pid=moved(state.pid, _EMPTY, _I32).reshape(shape),
        num_active=state.num_active - lost,
        overflow_count=state.overflow_count + lost)


def stale_per_row(state: TileState, config: SimConfig,
                  max_dy: int = 0):
    """[TY] int32: live slots per STORAGE row whose home tile differs
    from their storage tile — the per-row histogram of the stale-pair
    population.  A few-KB host fetch that drives the band-rebuild
    targeting (rebuild_band): bands go where the stale mass is.

    ``max_dy`` > 0 counts only DRAINABLE stale — |home row - storage
    row| < max_dy, i.e. mass a max_dy-row band can actually contain at
    both ends.  Without the filter, far-spilled populations (storage
    rings span the whole grid after a refused burst) register spikes
    no band placed there can drain, and argmax targeting would park
    every band on them forever (round-5 review finding)."""
    t, TY, TX = tile_geometry(config)
    cap, _, _ = state.dims
    live = state.occupied()
    ty_h, tx_h = _tile_of(state.x, state.y, jnp.float32(t))
    ty_h = jnp.clip(ty_h, 1, TY - 2)
    tx_h = jnp.clip(tx_h, 1, TX - 2)
    ty_s = jnp.broadcast_to(
        jnp.arange(TY, dtype=_I32)[None, :, None], state.pid.shape)
    tx_s = jnp.broadcast_to(
        jnp.arange(TX, dtype=_I32)[None, None, :], state.pid.shape)
    stale = live & ((ty_h != ty_s) | (tx_h != tx_s))
    if max_dy > 0:
        stale = stale & (jnp.abs(ty_h - ty_s) < max_dy)
    return jnp.sum(stale.astype(_I32), axis=(0, 2))


def rebuild_band(state: TileState, config: SimConfig, row0,
                 rows: int = 16) -> TileState:
    """Sectioned stale DRAIN: within the ``rows`` tile rows starting at
    traced ``row0``, every stale slot (storage tile != home tile, home
    inside the band) whose home tile has a DEAD slot is moved home;
    everything else — at-home particles, stale without home room,
    out-of-band homes — is left exactly in place.

    Why it exists: at the 4M-GS geometry (2.65M cells / 16M slots) the
    monolithic ``rebuild`` program does not compile — an 81-minute
    compile ERROR after five attempts across three sessions
    (docs/probes_r4/tpu_probe_gs_rebuild.jsonl) — yet the stale-pair
    creep it was meant to fix is structural (free-slot claims cannot
    resolve displacement chains across full tiles; the reference pays
    a wholesale rebuild every frame, grid.rs:322-332).  A band of
    10-20 rows is a few-hundred-k-slot program: compiles everywhere,
    costs ~23 ms on v5e, and because ``row0`` is TRACED one
    compilation serves every band position — the engine rotates/
    targets bands at sweep cadence (stale_per_row picks where).

    Why DRAIN and not a full re-slot: the first hardware probe
    (docs/probes_r5/tpu_probe_gs_bands.jsonl gs4m_bands240_k2/_k6) ran
    the wholesale-rebuild semantics per band — extract every in-band-
    homed particle, winners at home, losers zipped to arbitrary band
    free slots — and the stale population TRIPLED its creep rate
    (5% -> 26% over 5k steps, dose-independent): at 103% fill the only
    free slots are far from the dense regions, so the loser zip
    destroyed the near-home locality the claim relocate maintains (a
    particle stored ONE tile from home still collides correctly via
    the 3x3 membership window; a far-scattered one misses everything).
    The drain moves ONLY stale->home when home has room — monotone
    improvement by construction, nobody else is touched, nothing can
    scatter.  Chains resolve across successive sweeps: a departing
    stale slot becomes a dead slot that lets the next band pass pull
    the chain's tail home.

    Conservation is exact and unconditional (winners move, everyone
    else stays; ``num_active``/``overflow_count`` unchanged).
    ``row0`` is clamped to [0, TY - rows]; ``rows`` is static.
    """
    t, TY, TX = tile_geometry(config)
    cap, _, _ = state.dims
    rows = min(rows, TY)
    row0 = jnp.clip(jnp.asarray(row0, _I32), 0, TY - rows)
    NT = rows * TX
    S = cap * NT

    def band(plane):
        return jax.lax.dynamic_slice(
            plane, (jnp.int32(0), row0, jnp.int32(0)), (cap, rows, TX))

    bx, by, bpx, bpy, br, bpid = (band(p) for p in (
        state.x, state.y, state.px, state.py, state.radius, state.pid))

    live = (bpid >= 0).reshape(cap, NT)
    ty_h, tx_h = _tile_of(bx, by, jnp.float32(t))
    ty_h = jnp.clip(ty_h, 1, TY - 2)
    tx_h = jnp.clip(tx_h, 1, TX - 2)
    bty = (ty_h - row0).reshape(cap, NT)  # band-local home row
    lin_home = bty * TX + tx_h.reshape(cap, NT)
    t_store = jnp.arange(NT, dtype=_I32)[None, :]
    mover = (live & (bty >= 0) & (bty < rows)
             & (lin_home != t_store))  # stale with in-band home ONLY

    # movers: stable sort of (home tile, source slot) — deterministic
    # rank within each home group; fields are gathered via the source
    # index (2-payload sort + 6 small gathers beats an 8-payload sort)
    key = jnp.where(mover, lin_home, NT).reshape(-1)
    src = jnp.arange(S, dtype=_I32)
    key_s, src_s = jax.lax.sort((key, src), num_keys=1, is_stable=True)
    rank = _group_rank(key_s)
    in_band = key_s < NT

    # dead slots per home tile; the j-th ranked mover of a home group
    # lands in the home tile's j-th dead slot.  deadrank = exclusive
    # running count over the (small, static) cap axis.
    dead = ~live
    deadrank = jnp.cumsum(dead.astype(_I32), axis=0) - dead.astype(_I32)
    ndead = jnp.sum(dead.astype(_I32), axis=0)
    # slot_of[t * cap + j] = k of the j-th dead slot of tile t
    slot_src = jnp.broadcast_to(
        jnp.arange(cap, dtype=_I32)[:, None], (cap, NT))
    # non-dead slots get the OUT-of-bounds sentinel NT*cap so drop-mode
    # discards them — keeping the unique_indices promise honest (an
    # in-bounds shared sentinel under unique_indices=True is undefined
    # behavior; round-5 review finding)
    slot_pos = jnp.where(dead,
                         jnp.arange(NT, dtype=_I32)[None, :] * cap
                         + deadrank, NT * cap)
    slot_of = jnp.full(NT * cap, 0, _I32).at[
        slot_pos.reshape(-1)].set(slot_src.reshape(-1), mode="drop",
                                  unique_indices=True)

    key_c = jnp.minimum(key_s, NT - 1)
    win = in_band & (rank < ndead[key_c])
    dst_k = slot_of[key_c * cap + jnp.minimum(rank, cap - 1)]
    dst = jnp.where(win, dst_k * NT + key_c, S)
    win_src = jnp.where(win, src_s, S)
    src_g = jnp.where(win, src_s, 0)

    # winner destinations are dead slots, winner sources are live
    # slots — disjoint, so clear-then-set never collides
    def moved(bplane, fill):
        flat = bplane.reshape(-1)
        vals = flat[src_g]
        out = flat.at[win_src].set(fill, mode="drop",
                                   unique_indices=True)
        return out.at[dst].set(vals, mode="drop", unique_indices=True)

    def put(plane, flat):
        return jax.lax.dynamic_update_slice(
            plane, flat.reshape(cap, rows, TX),
            (jnp.int32(0), row0, jnp.int32(0)))

    return dataclasses.replace(
        state,
        x=put(state.x, moved(bx, 0.0)),
        y=put(state.y, moved(by, 0.0)),
        px=put(state.px, moved(bpx, 0.0)),
        py=put(state.py, moved(bpy, 0.0)),
        radius=put(state.radius, moved(br, 0.0)),
        pid=put(state.pid, moved(bpid, _EMPTY)))


# deterministic neighbor-fallback order for spawn inserts (home first):
# a spawn whose home tile is storage-full goes to a nearby tile —
# off-home storage is the deferred-mover invariant the pull relocate
# already walks home (multi-hop), so nothing is lost.  The reference
# NEVER refuses a spawn (its arrays grow and the grid rebuilds,
# state.rs:187-200 / grid.rs:265-291), so home-only insertion would be
# a parity break in dense scenes; the engines widen the ring ladder
# (ring_offsets) host-side until everyone is placed — like the init
# tiler's spill rings — and only a full GRID refuses (counted in
# overflow_count, loud).
INSERT_OFFSETS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1),
                  (-1, -1), (-1, 1), (1, -1), (1, 1))


@functools.lru_cache(maxsize=None)
def ring_offsets(ring: int):
    """(dy, dx) offsets at exact Chebyshev distance ``ring`` (row-major
    scan order, matching the init tiler's spill rings).  Cached: the
    far_targets ring scan re-walks the same rings for every entry, and
    regenerating the tuples dominated its worst case (ADVICE r4)."""
    if ring == 0:
        return ((0, 0),)
    return tuple((dy, dx)
                 for dy in range(-ring, ring + 1)
                 for dx in range(-ring, ring + 1)
                 if max(abs(dy), abs(dx)) == ring)


def insert_batch(state: TileState, config: SimConfig, positions, radii,
                 pids, placed, offsets):
    """One fallback round: try each (dy, dx) in ``offsets`` (static) for
    every not-yet-``placed`` entry.  Returns (state, placed') — NO
    num_active/overflow bookkeeping (the caller's ring ladder does it
    once at the end).  Jittable with static ``offsets``."""
    t, TY, TX = tile_geometry(config)
    x = jnp.asarray(positions[:, 0], jnp.float32)
    y = jnp.asarray(positions[:, 1], jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    # rows 1..TY-2 are usable storage — the SAME bound as the init
    # tiler's spill rings: the rows above the world (8-multiple pad)
    # legitimately house storage overflow when the in-world grid is
    # over capacity (a compressed scene), and the kernels/relocate
    # treat them like any other tile
    ty_hi = TY - 2
    ty_t, tx_t = _tile_of(x, y, jnp.float32(t))
    ty_t = jnp.clip(ty_t, 1, ty_hi)
    tx_t = jnp.clip(tx_t, 1, TX - 2)
    fields = (x, y, x, y, r, jnp.asarray(pids, _I32))
    for dy, dx in offsets:
        ty_o = jnp.clip(ty_t + dy, 1, ty_hi)
        tx_o = jnp.clip(tx_t + dx, 1, TX - 2)
        state, won = _insert_compacted(state, ty_o, tx_o, fields, ~placed)
        placed = placed | won
    return state, placed


def insert_at_tiles(state: TileState, positions, radii, pids,
                    ty_t, tx_t, placed):
    """Place not-yet-``placed`` entries at host-chosen (ty_t, tx_t)
    target tiles (far-spill path: the host picked nearest-free tiles
    from downloaded occupancy, so placement succeeds whenever the
    chosen tiles really have room).  Returns (state, placed')."""
    x = jnp.asarray(positions[:, 0], jnp.float32)
    y = jnp.asarray(positions[:, 1], jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    fields = (x, y, x, y, r, jnp.asarray(pids, _I32))
    state, won = _insert_compacted(state, jnp.asarray(ty_t, _I32),
                                   jnp.asarray(tx_t, _I32), fields,
                                   ~placed)
    return state, placed | won


def far_targets(free_counts, ty_t, tx_t, todo, ty_hi, TX):
    """Host-side nearest-free-tile targets for ``todo`` entries (numpy;
    the init tiler's widening ring scan).  ``free_counts`` is the
    [TY, TX] per-tile free-slot count; decremented greedily in ascending
    entry order.  Returns (ty, tx, found) — ``found`` False only when
    the whole interior grid is full."""
    import numpy as np
    free = np.array(free_counts, np.int64, copy=True)
    TY = free.shape[0]
    hty = np.asarray(ty_t, np.int64)
    htx = np.asarray(tx_t, np.int64)
    oty = hty.copy()
    otx = htx.copy()
    found = np.zeros(oty.shape[0], bool)
    # a full interior grid means no entry can land anywhere: conclude
    # that in O(grid) up front instead of O(entries x grid) ring scans
    # (at GS-class ~2.65M-tile geometries a refused burst would
    # otherwise stall the host for minutes — ADVICE r4)
    interior_free = int(free[1:ty_hi + 1, 1:TX - 1].sum())
    if interior_free == 0:
        return oty, otx, found
    for i in np.nonzero(np.asarray(todo))[0]:
        if interior_free == 0:
            break
        dest = None
        for ring in range(0, max(TY, TX)):
            for dy, dx in ring_offsets(ring):
                sy, sx = hty[i] + dy, htx[i] + dx
                if not (1 <= sy <= ty_hi and 1 <= sx <= TX - 2):
                    continue
                if free[sy, sx] > 0:
                    dest = (sy, sx)
                    break
            if dest is not None:
                break
        if dest is None:
            continue
        free[dest] -= 1
        interior_free -= 1
        oty[i], otx[i] = dest
        found[i] = True
    return oty, otx, found


def spawn_insert_into(engine, ring1, place_at, positions, radii, ids):
    """Shared spawn-insert flow for TiledEngine and ShardedTiledEngine
    (their bodies were line-for-line duplicates — round-5 review
    finding; the ADVICE-r4 donation fix had to be hand-applied twice).

    ``ring1``/``place_at`` are the engine's compiled insert programs
    (home + ring-1 round, then host-chosen far targets).  The engine's
    ``state`` is rebound IMMEDIATELY after each donating call so an
    exception anywhere in the host far-spill path leaves the engine
    holding a valid (conservative: spawns not yet counted) state
    instead of donated/invalidated buffers (ADVICE r4).  Returns the
    final state; the reference never refuses a spawn — only a full
    interior grid does (loudly, into overflow_count)."""
    import numpy as np
    cfg = engine.config
    placed = jnp.zeros(np.asarray(radii).reshape(-1).shape[0], bool)
    engine.state, placed = ring1(engine.state, positions, radii, ids,
                                 placed)
    if not bool(placed.all()):
        t, TY, TX = tile_geometry(cfg)
        ty_hi = TY - 2  # the init tiler's spill bound; slab pads and
        #                 the world-top pad rows house overflow alike
        free = np.asarray((engine.state.pid < 0).sum(axis=0))
        p_np = np.asarray(positions)
        hty = np.clip((p_np[:, 1] // t).astype(np.int64) + 1, 1, ty_hi)
        htx = np.clip((p_np[:, 0] // t).astype(np.int64) + 1, 1, TX - 2)
        ty2, tx2, found = far_targets(
            free, hty, htx, ~np.asarray(placed), ty_hi, TX)
        if found.any():
            # mask ~found as "placed" so place_at skips them, then
            # strip them back out: only entries with a real host-found
            # target count as placed
            engine.state, placed2 = place_at(
                engine.state, positions, radii, ids,
                jnp.asarray(ty2), jnp.asarray(tx2),
                placed | jnp.asarray(~found))
            placed = placed | (placed2 & jnp.asarray(found))
    n_placed = int(jnp.sum(placed))
    engine.state = dataclasses.replace(
        engine.state,
        num_active=engine.state.num_active + jnp.int32(n_placed),
        overflow_count=engine.state.overflow_count
        + jnp.int32(placed.shape[0] - n_placed))
    return engine.state


def insert_particles(state: TileState, config: SimConfig, positions, radii,
                     pids) -> TileState:
    """Spawn path: place new particles (device-side, jittable).  Tries
    the home tile + ring-1 fallback (static unroll — bounded so the
    jitted program stays small; the engines' host-side far-spill goes
    wider when this round leaves anyone unplaced)."""
    placed = jnp.zeros(jnp.asarray(radii).reshape(-1).shape[0], bool)
    state, placed = insert_batch(state, config, positions, radii, pids,
                                 placed, INSERT_OFFSETS)
    n_placed = jnp.sum(placed.astype(_I32))
    return dataclasses.replace(
        state,
        num_active=state.num_active + n_placed,
        overflow_count=state.overflow_count
        + (placed.shape[0] - n_placed))


# ---------------------------------------------------------------------------
# full step
# ---------------------------------------------------------------------------

def _relocate_passes(relocate_fn, state: TileState,
                     config: SimConfig) -> TileState:
    """Run relocate_fn ``tiled_relocate_passes`` times.  Matching is
    one-shot within a pass, so an arrival cannot take a slot vacated by a
    mover leaving the same full tile this step; a second pass re-matches
    against post-departure occupancy (SimConfig.tiled_relocate_passes).
    Only the FINAL pass's deferrals accumulate into overflow_count — a
    mover placed by a later pass was never truly deferred."""
    for p in range(max(1, config.tiled_relocate_passes)):
        oc = state.overflow_count
        state = relocate_fn(state, config)
        if p < config.tiled_relocate_passes - 1:
            state = dataclasses.replace(state, overflow_count=oc)
    return state


def tiled_step_fn(state: TileState, params: StepParams,
                  config: SimConfig, do_relocate: bool = True) -> TileState:
    """Frame order mirrors State::update (state.rs:115-134): relocate
    (the grid-maintenance analog) -> solve -> integrate.

    ``do_relocate=False`` skips the relocate phase (trace-time static) —
    the engine's chunk scan passes it on the off-steps of
    SimConfig.tiled_relocate_interval; positions stay exact, only tile
    STORAGE goes stale within the hysteresis/drift bound (see the
    interval field's doc in core/config.py).

    tiled_solver="gs" selects the Gauss-Seidel PARITY solver on tile
    storage (ops/gs_tiled.py / ops/gs_pallas.py): exact reference
    semantics (4-color ordered sweeps, frozen membership) at band-kernel
    speed.  Drive it with tile_multiplier=2.2 (tiles = reference cells).
    The standard relocate selection applies: hysteresis-band particles
    remain fully reachable for GS membership (depth <= delta < t - r
    means a particle can never be an occupant of a cell 2 tiles from its
    storage), so only genuine deferrals (full target tiles, counted in
    overflow_count) deviate from exact reference membership; use
    tiled_relocate="jnp" (exact claim) for bit-parity runs — the
    hardware path amortizes the claim cost through the periodic sweep."""
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = config.tiled_collide == "pallas" or (
        config.tiled_collide == "auto" and on_tpu)
    if config.tiled_solver == "gs":
        if use_pallas and config.gs_layout == "par":
            # whole step in parity space (ops/gs_parity.py); this
            # single-step facade pays the relayout per call — the
            # engine's scanned chunks amortize it (gs_parity_tile_step
            # with n_steps = chunk)
            from gpu_physics_engine_tpu.ops.gs_parity import (
                gs_parity_tile_step)
            return gs_parity_tile_step(state, params, config, 1)
        if use_pallas:
            from gpu_physics_engine_tpu.ops.gs_pallas import gs_solve_pallas
            gs_fn = gs_solve_pallas
        else:
            from gpu_physics_engine_tpu.ops.gs_tiled import gs_solve
            gs_fn = gs_solve
        gs_pallas_reloc = config.tiled_relocate == "pallas" or (
            config.tiled_relocate == "auto" and on_tpu)
        if gs_pallas_reloc:
            from gpu_physics_engine_tpu.ops.tiled_pallas import (
                relocate_pallas)
            gs_reloc = relocate_pallas
        else:
            gs_reloc = relocate
        with jax.named_scope("relocate"):
            state = _relocate_passes(gs_reloc, state, config)
        for _ in range(config.substeps):
            with jax.named_scope("solve_collisions"):
                state = gs_fn(state, config)
            with jax.named_scope("particle_integration"):
                state = integrate(state, params, config,
                                  dt_scale=1.0 / config.substeps)
        return state
    if use_pallas:
        from gpu_physics_engine_tpu.ops.tiled_pallas import collide_pallas
        collide_fn = collide_pallas
    else:
        collide_fn = collide
    pallas_reloc = config.tiled_relocate == "pallas" or (
        config.tiled_relocate == "auto" and on_tpu)
    if pallas_reloc:
        from gpu_physics_engine_tpu.ops.tiled_pallas import relocate_pallas
        relocate_fn = relocate_pallas
    else:
        relocate_fn = relocate

    if do_relocate:
        with jax.named_scope("relocate"):
            state = _relocate_passes(relocate_fn, state, config)
    if use_pallas and config.tiled_fuse_integrate:
        from gpu_physics_engine_tpu.ops.tiled_pallas import (
            collide_integrate_pallas)
        for _ in range(config.substeps):
            with jax.named_scope("solve_and_integrate"):
                state = collide_integrate_pallas(
                    state, params, config,
                    dt_scale=1.0 / config.substeps)
        return state
    for _ in range(config.substeps):
        with jax.named_scope("solve_collisions"):
            state = collide_fn(state, config)
        with jax.named_scope("particle_integration"):
            state = integrate(state, params, config,
                              dt_scale=1.0 / config.substeps)
    return state


def make_tiled_step(config: SimConfig):
    return jax.jit(partial(tiled_step_fn, config=config), donate_argnums=0)
