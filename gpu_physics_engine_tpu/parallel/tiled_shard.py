"""Multi-chip persistent tiled pipeline: tile-row slabs + halo-row exchange.

Shards the tiled engine (ops/tiled.py) over a 1D mesh by cutting the tile
grid into horizontal slabs of rows.  Because the engine's storage IS the
spatial structure, multi-chip communication becomes beautifully regular —
fixed-shape tile rows instead of the packed particle buffers the sorted
pipeline needs (parallel/halo.py):

  1. **Collision halo**: each chip ppermutes its first/last tile row
     (x, y, r, occupancy — [CAP, 1, TX] each) to its neighbors, prepends/
     appends the received rows, runs the SAME collide kernel on the
     extended slab, and keeps the middle.  One row of halo suffices: the
     3x3 stencil reads one tile in each direction.
  2. **Integration**: purely local.
  3. **Relocation**: movers whose target row stays in the slab use the
     local claim machinery (ops/tiled.py::_insert_compacted); movers that
     cross a slab boundary (a subset of row-crossers, ~0.01%/step) are
     packed into fixed per-direction buffers and shipped with a two-phase
     commit: copies are ppermuted, the receiver claims slots, the placed
     mask is ppermuted back, and the sender removes only confirmed
     entries.  Pack-buffer overflow and receiver-full both DEFER the
     mover (it stays in place and retries, like the single-chip claim
     relocate); every deferral is counted per chip — nothing is lost and
     nothing is silent.

The global tile grid keeps its empty border ring; slab 0's top halo and
slab n-1's bottom halo read it, so world edges need no special casing.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import StepParams
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.tiled import TileState, _tile_of

_I32 = jnp.int32


def sharded_tile_geometry(config: SimConfig, n_shards: int):
    """(tile_edge, TY_padded, TX, rows_per_shard). TY is padded so every
    shard owns the same number of rows; pad rows sit above the world and
    stay empty (the border ring logic already keeps them vacant)."""
    t, TY, TX = tiled.tile_geometry(config)
    rows = int(math.ceil(TY / n_shards))
    return t, rows * n_shards, TX, rows


def init_sharded_tiles(config: SimConfig, mesh: Mesh, positions, radii,
                       pids=None, previous_positions=None) -> TileState:
    """Build a TileState whose row axis is sharded over the mesh.
    ``pids``/``previous_positions`` resume an exported particle set
    (checkpoint path) instead of a fresh spawn."""
    axis = config.mesh_axis
    n = mesh.devices.size
    t, TYp, TX, _rows = sharded_tile_geometry(config, n)
    cap = config.tile_cap

    # reuse the host-side tiler, then pad rows to the sharded height
    st = tiled.init_tiles(config, positions, radii, pids=pids,
                          previous_positions=previous_positions)
    pad = TYp - st.dims[1]

    def padrow(a, fill):
        return np.concatenate(
            [np.asarray(a),
             np.full((cap, pad, TX), fill, np.asarray(a).dtype)], axis=1)

    shard = NamedSharding(mesh, P(None, axis, None))
    put = lambda a, fill=0.0: jax.device_put(padrow(a, fill), shard)
    rep = NamedSharding(mesh, P())
    return TileState(
        x=put(st.x), y=put(st.y), px=put(st.px), py=put(st.py),
        radius=put(st.radius), pid=put(st.pid, fill=-1),
        num_active=jax.device_put(st.num_active, rep),
        overflow_count=jax.device_put(st.overflow_count, rep),
    )


def make_sharded_tiled_step_fn(config: SimConfig, mesh: Mesh,
                               do_relocate: bool = True,
                               relocate_only: bool = False):
    """``do_relocate=False`` builds the off-step of
    SimConfig.tiled_relocate_interval: halo exchange + collide +
    integrate only — relocation AND boundary-crosser migration are
    skipped together (both only move storage; positions stay exact and
    the auto hysteresis reserved (interval-1) steps of drift, so every
    particle's 3x3 storage neighborhood — including cross-slab halo
    rows — still covers its pair set).

    ``relocate_only=True`` builds the periodic EXACT sweep (TiledEngine
    parity: the claim relocate handles arbitrary jumps, so it runs at
    the Morton-resort cadence as the multi-hop-staleness safety net for
    the one-hop pull relocate): no physics, just the exact jnp
    relocation + cross-slab migration, one slab hop per invocation."""
    assert not (relocate_only and not do_relocate)
    # refuse configs whose semantics this builder does not implement —
    # silently running a different solver/relocation would present
    # wrong results as parity (single-chip tiled.py branches on both)
    if config.tiled_solver != "sweep":
        raise ValueError(
            f"tiled_solver={config.tiled_solver!r} is single-chip only "
            "(the GS parity solver needs storage == home every step); "
            "the sharded step runs the production Jacobi sweep")
    if config.tiled_relocate_passes != 1:
        raise ValueError(
            "tiled_relocate_passes > 1 is not implemented on the "
            "sharded step (single-chip only)")
    axis = config.mesh_axis
    n = mesh.devices.size
    t, TYp, TX, rows = sharded_tile_geometry(config, n)
    cap = config.tile_cap
    m_cap = config.migration_capacity
    up_perm = [(i, i - 1) for i in range(1, n)]
    dn_perm = [(i, i + 1) for i in range(n - 1)]

    def exchange_rows(field):
        """(row_from_above, row_from_below), each [cap, 1, TX].
        ppermute zero-fills the mesh edges; vacancy at the edges is
        carried by the separate occ plane (a zero pid row would read as
        live particle 0 — never use the pid plane's halos directly)."""
        first = field[:, :1, :]
        last = field[:, -1:, :]
        from_below = jax.lax.ppermute(first, axis, up_perm)   # my bottom halo
        from_above = jax.lax.ppermute(last, axis, dn_perm)    # my top halo
        return from_above, from_below

    # Backend/config selection is static (resolved at build time, not
    # trace time), so the vma-check policy can be scoped precisely:
    #   * jnp path (all-CPU tests): full check_vma.
    #   * pallas on real TPU: full check_vma; the kernels declare their
    #     outputs varying over the mesh axis (vma= on their out_shape).
    #   * pallas in interpret mode (CPU dryrun): check_vma must stay off —
    #     the HLO interpreter re-evals the kernel jaxpr under the manual
    #     trace and cannot mix varying refs with kernel constants (JAX
    #     raises "Primitive ... requires varying manual axes to match" and
    #     itself prescribes check_vma=False as the workaround).
    use_pallas = config.tiled_collide == "pallas" or (
        config.tiled_collide == "auto" and jax.default_backend() == "tpu")
    pallas_reloc = config.tiled_relocate == "pallas" or (
        config.tiled_relocate == "auto" and jax.default_backend() == "tpu")
    interp = jax.default_backend() != "tpu"
    any_pallas = use_pallas or pallas_reloc
    check_vma = not (any_pallas and interp)
    _vma = (axis,) if (any_pallas and check_vma) else None

    def local_step(x, y, px, py, r, pid, num_active, dropped,
                   params: StepParams):
        d = jax.lax.axis_index(axis)
        row0 = d.astype(_I32) * rows  # my first global row
        local = TileState(
            x=x, y=y, px=px, py=py, radius=r, pid=pid,
            num_active=num_active, overflow_count=dropped)

        for _ in range(0 if relocate_only else config.substeps):
            # ---- 1. halo rows + collide (+integrate) on the extended slab
            occ = (local.pid >= 0).astype(jnp.float32)
            ext_fields = []
            for f in (local.x, local.y, local.radius, occ):
                top, bot = exchange_rows(f)
                ext_fields.append(jnp.concatenate([top, f, bot], axis=1))
            ex, ey, er, eocc = ext_fields
            epid = jnp.where(eocc > 0, 0, -1).astype(_I32)
            if use_pallas and config.tiled_fuse_integrate:
                # fused substep on the extended slab: halo rows carry dummy
                # px/py (their integration output is sliced away; only
                # their positions/radii feed the middle rows' pair sweep)
                zrow = jnp.zeros_like(local.px[:, :1, :])
                ext = TileState(
                    x=ex, y=ey,
                    px=jnp.concatenate([zrow, local.px, zrow], axis=1),
                    py=jnp.concatenate([zrow, local.py, zrow], axis=1),
                    radius=er, pid=epid,
                    num_active=local.num_active,
                    overflow_count=local.overflow_count)
                from gpu_physics_engine_tpu.ops.tiled_pallas import (
                    collide_integrate_pallas)
                solved = collide_integrate_pallas(
                    ext, params, config, dt_scale=1.0 / config.substeps,
                    vma=_vma)
                local = dataclasses.replace(
                    local,
                    x=solved.x[:, 1:-1, :], y=solved.y[:, 1:-1, :],
                    px=solved.px[:, 1:-1, :], py=solved.py[:, 1:-1, :])
                continue
            ext = TileState(
                x=ex, y=ey, px=ex, py=ey, radius=er, pid=epid,
                num_active=local.num_active,
                overflow_count=local.overflow_count)
            if use_pallas:
                from gpu_physics_engine_tpu.ops.tiled_pallas import (
                    collide_pallas)
                solved = collide_pallas(ext, config, vma=_vma)
            else:
                solved = tiled.collide(ext, config)
            local = dataclasses.replace(
                local, x=solved.x[:, 1:-1, :], y=solved.y[:, 1:-1, :])

            # ---- 2. integrate (local) ----
            local = tiled.integrate(local, params, config,
                                    dt_scale=1.0 / config.substeps)

        # ---- 3. relocation (skipped on interval off-steps) ----
        if not do_relocate:
            alive = jnp.sum((local.pid >= 0).astype(_I32))
            n_alive = jax.lax.psum(alive, axis)
            zero = alive * 0  # axis-varying zero (out_specs: P(axis))
            return (local.x, local.y, local.px, local.py, local.radius,
                    local.pid, n_alive, dropped, zero[None])
        occ = local.pid >= 0
        ty_want_g, tx_want = _tile_of(local.x, local.y, jnp.float32(t))
        ty_want_g = jnp.clip(ty_want_g, 1, TYp - 2)
        tx_want = jnp.clip(tx_want, 1, TX - 2)
        ty_now_l = jax.lax.broadcasted_iota(_I32, local.x.shape, 1)
        tx_now = jax.lax.broadcasted_iota(_I32, local.x.shape, 2)
        ty_want_l = ty_want_g - row0

        flat_size = cap * rows * TX

        def pack(state, mask, extra, size):
            """Compact masked slots of ``state`` into [size] buffers.
            ``state`` is explicit on purpose: ship_crossers rebinds its
            own ``local`` between directions, and a closure over the
            enclosing one would silently pack stale fields."""
            fm = mask.reshape(-1)
            (idx,) = jnp.nonzero(fm, size=size, fill_value=flat_size)
            live = idx < flat_size
            idx = jnp.where(live, idx, 0)

            def take(a, fill):
                v = a.reshape(-1)[idx]
                return jnp.where(live, v, jnp.asarray(fill, v.dtype))

            fields = (take(state.x, 0), take(state.y, 0),
                      take(state.px, 0), take(state.py, 0),
                      take(state.radius, 0), take(state.pid, -1))
            extras = tuple(take(e, 0) for e in extra)
            n_mask = jnp.sum(fm.astype(_I32))
            return idx, live, fields, extras, n_mask

        total_drop = jnp.int32(0)

        def oob_of(size):
            return flat_size + jnp.arange(size, dtype=_I32)

        oob = oob_of(m_cap)

        def ship_crossers(go_up, go_dn, tx_target, local):
            """Ship slab-boundary crossers with a two-phase commit.

            The sender ppermutes COPIES; the receiver claims slots and
            ppermutes the placed mask back; the sender removes only
            confirmed entries.  A crosser whose receiving tile is full
            (floor-jam pile-ups reach genuine cap exhaustion) therefore
            stays in place and retries next step — the same deferral
            semantics as the single-chip claim relocate.  Nothing is ever
            lost; total_drop counts deferral events (pack-buffer overflow
            + unconfirmed ships), the per-chip physics-quality signal."""
            nonlocal total_drop
            for mask, perm, back_perm, into_row in (
                    (go_up, up_perm, dn_perm, rows - 1),
                    (go_dn, dn_perm, up_perm, 0)):
                idx_c, live_c, fields_c, (txc,), n_cross = pack(
                    local, mask, (tx_target,), m_cap)
                # pack-buffer overflow: mover stays in place, deferred
                total_drop += n_cross - jnp.sum(live_c.astype(_I32))

                sent = [jax.lax.ppermute(v, axis, perm)
                        for v in (*fields_c, txc, live_c.astype(_I32))]
                rf, rtx, rlive = sent[:6], sent[6], sent[7] > 0
                rty = jnp.full((m_cap,), into_row, _I32)
                local, placed_c = tiled._insert_compacted(
                    local, rty, jnp.where(rlive, rtx, 0), tuple(rf), rlive)

                # confirm: receiver returns its placed mask; the sender
                # removes exactly the entries that now live remotely
                confirm = jax.lax.ppermute(
                    placed_c.astype(_I32), axis, back_perm) > 0
                ok = live_c & confirm
                rm = jnp.where(ok, idx_c, oob)
                pidf = local.pid.reshape(-1).at[rm].set(
                    -1, mode="drop", unique_indices=True)
                local = dataclasses.replace(
                    local, pid=pidf.reshape(local.pid.shape))
                total_drop += jnp.sum((live_c & ~confirm).astype(_I32))
            return local

        if pallas_reloc and not relocate_only:
            # pull relocation on the slab: ship the one-hop boundary
            # crossers first, then the bufferless band kernels handle every
            # in-slab mover (ops/tiled_pallas.py — slab coords via row0).
            # Crosser determination uses the SAME hysteresis step offsets
            # as the kernels, so ship and in-slab relocation agree.
            from gpu_physics_engine_tpu.ops.tiled_pallas import (
                _step_offsets, relocate_pallas)
            dty, dtx = _step_offsets(
                local.x, local.y, ty_now_l + row0, tx_now,
                t=t, delta=config.hysteresis_delta, gTY=TYp, gTX=TX)
            go_up = occ & (ty_now_l == 0) & (dty < 0)
            go_dn = occ & (ty_now_l == rows - 1) & (dty > 0)
            local = ship_crossers(go_up, go_dn, tx_now + dtx, local)
            of0 = local.overflow_count
            local = relocate_pallas(local, config, row0=row0,
                                    global_rows=TYp, vma=_vma)
            total_drop += local.overflow_count - of0
            local = dataclasses.replace(local, overflow_count=of0)
        else:
            mover = occ & ((ty_want_l != ty_now_l) | (tx_want != tx_now))
            stays = (ty_want_l >= 0) & (ty_want_l < rows)
            go_up = mover & (ty_want_l < 0)
            go_dn = mover & (ty_want_l >= rows)
            local_move = mover & stays

            # local movers first (claim free slots in my slab).  These
            # use the single-chip mover_capacity, NOT the cross-slab
            # migration_capacity: the periodic exact sweep relocates the
            # whole hysteresis-band backlog at once, and capping it at
            # m_cap (256) would strand multi-hop-stale movers for many
            # sweeps at production scale.  For the SWEEP the budget
            # scales with the slab population, mirroring TiledEngine's
            # jam defense (DESIGN.md §9 "4M storage-jam": an
            # under-provisioned sweep can never drain a dense slab's
            # displaced-storage backlog).
            if relocate_only:
                cap_ = local.dims[0]
                slab_slots = cap_ * rows * TX
                l_cap = config.sweep_mover_capacity or max(
                    config.mover_capacity, slab_slots // 32)
            else:
                l_cap = config.mover_capacity
            idx_l, live_l, fields_l, (tyl, txl), n_local = pack(
                local, local_move, (jnp.clip(ty_want_l, 0, rows - 1),
                                    tx_want), l_cap)
            total_drop += n_local - jnp.sum(live_l.astype(_I32))
            new_local, placed = tiled._insert_compacted(
                local, tyl, txl, fields_l, live_l)
            rm = jnp.where(placed, idx_l, oob_of(l_cap))
            pidf = new_local.pid.reshape(-1).at[rm].set(
                -1, mode="drop", unique_indices=True)
            local = dataclasses.replace(
                new_local, pid=pidf.reshape(local.pid.shape))

            local = ship_crossers(go_up, go_dn, tx_want, local)

        n_alive = jax.lax.psum(
            jnp.sum((local.pid >= 0).astype(_I32)), axis)
        total_drop_g = jax.lax.psum(total_drop, axis)
        return (local.x, local.y, local.px, local.py, local.radius,
                local.pid, n_alive, dropped + total_drop_g,
                total_drop[None])  # per-chip deferral this step

    sharded = P(None, axis, None)
    rep = P()
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(sharded,) * 6 + (rep, rep, rep),
        out_specs=(sharded,) * 6 + (rep, rep, P(axis)),
        check_vma=check_vma,
    )

    def step_fn(state: TileState, params: StepParams):
        """(state, per_chip_drop[i32[n_shards]]) — raw, scannable."""
        out = mapped(state.x, state.y, state.px, state.py, state.radius,
                     state.pid, state.num_active, state.overflow_count,
                     params)
        return TileState(*out[:-1]), out[-1]

    return step_fn


def make_sharded_tiled_step(config: SimConfig, mesh: Mesh):
    """One jitted sharded step: state, params -> state (facade-compatible;
    per-chip deferral via make_sharded_tiled_step_fn)."""
    step_fn = make_sharded_tiled_step_fn(config, mesh)

    @jax.jit
    def step(state: TileState, params: StepParams) -> TileState:
        return step_fn(state, params)[0]

    return step


def make_sharded_insert(config: SimConfig, mesh: Mesh,
                        offsets=tiled.INSERT_OFFSETS):
    """One spawn-insert round for the sharded tiled engine: the burst
    arrays are replicated to every chip; each chip inserts the particles
    whose target tile row lies in its slab (the others see them as dead
    entries).

    Like the single-chip ops/tiled.insert_batch, a storage-full home
    tile falls back over ``offsets`` (static) — the reference never
    refuses a spawn; anyone still unplaced after this in-program ring-1
    round goes through the engine's HOST far spill (download free
    counts, ops/tiled.far_targets ring scan, one place-at-tiles
    program — wider in-program rings were measured to blow up the jit
    unroll).  Rounds run in a fixed global order with
    the placed mask psum-synced between rounds: within one round a
    particle's target tile row has exactly ONE owning chip, so no
    particle can be placed twice even when the fallback tile lies in a
    different slab than the home tile.  Fallback rows clip to the REAL
    interior rows: the 8-multiple pad rows of tile_geometry AND the
    slab pad rows above them must stay vacant (they alias the next
    slab's halo reads).  Returns (state', placed') with NO
    num_active/overflow bookkeeping — the ladder does it once."""
    axis = config.mesh_axis
    n = mesh.devices.size
    t, TYp, TX, rows = sharded_tile_geometry(config, n)
    # rows 1..TY-2 of the REAL (8-padded) grid are usable storage (the
    # init tiler's spill bound — init_sharded_tiles populates exactly
    # this range before slab-padding); the slab pad rows above must
    # stay vacant (they alias the next slab's halo reads)
    ty_hi = tiled.tile_geometry(config)[1] - 2

    def local_insert(x, y, px, py, r, pid, num_active, dropped,
                     sx, sy, sr, sid, placed):
        d = jax.lax.axis_index(axis)
        row0 = d.astype(_I32) * rows
        local = TileState(x=x, y=y, px=px, py=py, radius=r, pid=pid,
                          num_active=num_active, overflow_count=dropped)
        ty_g, tx_t = _tile_of(sx, sy, jnp.float32(t))
        ty_g = jnp.clip(ty_g, 1, ty_hi)
        tx_t = jnp.clip(tx_t, 1, TX - 2)
        fields = (sx, sy, sx, sy, sr, sid)
        for dy, dx in offsets:
            ty_o = jnp.clip(ty_g + dy, 1, ty_hi)
            tx_o = jnp.clip(tx_t + dx, 1, TX - 2)
            ty_l = ty_o - row0
            mine = ~placed & (ty_l >= 0) & (ty_l < rows)
            local, won = tiled._insert_compacted(
                local, jnp.clip(ty_l, 0, rows - 1), tx_o, fields, mine)
            placed = jax.lax.psum(
                (placed | won).astype(_I32), axis) > 0
        return (local.x, local.y, local.px, local.py, local.radius,
                local.pid, placed)

    sharded = P(None, axis, None)
    rep = P()
    mapped = jax.shard_map(
        local_insert, mesh=mesh,
        in_specs=(sharded,) * 6 + (rep,) * 7,
        out_specs=(sharded,) * 6 + (rep,),
    )

    @jax.jit
    def insert(state: TileState, positions, radii, pids, placed):
        out = mapped(state.x, state.y, state.px, state.py, state.radius,
                     state.pid, state.num_active, state.overflow_count,
                     jnp.asarray(positions[:, 0], jnp.float32),
                     jnp.asarray(positions[:, 1], jnp.float32),
                     jnp.asarray(radii, jnp.float32),
                     jnp.asarray(pids, _I32), placed)
        new = TileState(*out[:6], num_active=state.num_active,
                        overflow_count=state.overflow_count)
        return new, out[6]

    return insert


def make_sharded_place_at(config: SimConfig, mesh: Mesh):
    """Far-spill placement at host-chosen GLOBAL (ty, tx) target tiles
    (replicated): the chip owning the target row inserts; the placed
    mask is psum-shared.  One small program — the wide-ring scan stays
    on the host (ops/tiled.far_targets)."""
    axis = config.mesh_axis
    n = mesh.devices.size
    _, _, _, rows = sharded_tile_geometry(config, n)

    def local_place(x, y, px, py, r, pid, sx, sy, sr, sid,
                    ty_t, tx_t, placed):
        d = jax.lax.axis_index(axis)
        row0 = d.astype(_I32) * rows
        local = TileState(x=x, y=y, px=px, py=py, radius=r, pid=pid,
                          num_active=jnp.int32(0),
                          overflow_count=jnp.int32(0))
        ty_l = ty_t - row0
        mine = ~placed & (ty_l >= 0) & (ty_l < rows)
        fields = (sx, sy, sx, sy, sr, sid)
        local, won = tiled._insert_compacted(
            local, jnp.clip(ty_l, 0, rows - 1), tx_t, fields, mine)
        placed = jax.lax.psum((placed | won).astype(_I32), axis) > 0
        return (local.x, local.y, local.px, local.py, local.radius,
                local.pid, placed)

    sharded = P(None, axis, None)
    rep = P()
    mapped = jax.shard_map(
        local_place, mesh=mesh,
        in_specs=(sharded,) * 6 + (rep,) * 7,
        out_specs=(sharded,) * 6 + (rep,),
    )

    @jax.jit
    def place(state: TileState, positions, radii, pids, ty_t, tx_t,
              placed):
        out = mapped(state.x, state.y, state.px, state.py, state.radius,
                     state.pid,
                     jnp.asarray(positions[:, 0], jnp.float32),
                     jnp.asarray(positions[:, 1], jnp.float32),
                     jnp.asarray(radii, jnp.float32),
                     jnp.asarray(pids, _I32),
                     jnp.asarray(ty_t, _I32), jnp.asarray(tx_t, _I32),
                     placed)
        new = TileState(*out[:6], num_active=state.num_active,
                        overflow_count=state.overflow_count)
        return new, out[6]

    return place


class ShardedTiledEngine:
    """Engine facade over the sharded tiled pipeline — the TiledEngine API
    on a device mesh (run/step/spawn/mouse/downloads).  Downloads assume
    all shards are addressable from this host (single-host meshes)."""

    def __init__(self, config: SimConfig, mesh: Mesh = None, seed: int = 0,
                 initial_arrays=None):
        """``initial_arrays`` = (positions, radii, pids, previous) resumes
        an exported particle set (see from_checkpoint) instead of the
        fresh uniform spawn."""
        from gpu_physics_engine_tpu.core.tiled_engine import _auto_cap
        from gpu_physics_engine_tpu.parallel.mesh import make_mesh
        from gpu_physics_engine_tpu.utils.timer import FrameTimer

        if config.tiled_sweep in ("rebuild", "bands"):
            # the wholesale sort rebuild is a GLOBAL stable re-slot; a
            # slab-local rebuild would strand cross-slab movers and a
            # global one defeats the slab decomposition (an all-gather
            # of every plane).  Same for the band rebuild: a band
            # straddling a slab boundary would need cross-slab slot
            # claims.  Loud, like the sharded-GS exclusion — the claim
            # sweep + two-phase migration is the sharded
            # storage-health mechanism (PARITY.md).
            raise ValueError(
                f"tiled_sweep={config.tiled_sweep!r} is single-chip "
                "only: the sharded engine's periodic exact sweep is "
                "the slab claim sweep (set tiled_sweep='relocate' or "
                "run single-chip)")
        if config.tiled_rebuild_every:
            # same exclusion as above: the hybrid's k-th sweep IS the
            # global rebuild
            raise ValueError(
                "tiled_rebuild_every is single-chip only (the hybrid's "
                "k-th sweep is the global rebuild; see the "
                "tiled_sweep='rebuild' exclusion)")

        self.mesh = mesh if mesh is not None else make_mesh()
        self._key = jax.random.key(seed)
        k1, k2, self._key = jax.random.split(self._key, 3)
        pids = prev = None
        if initial_arrays is not None:
            positions, radii, pids, prev = initial_arrays
            positions = np.asarray(positions, np.float32)
            radii = np.asarray(radii, np.float32)
            n = len(positions)
        else:
            n = config.initial_particles
            positions = np.stack([
                np.asarray(jax.random.uniform(
                    k1, (n,), jnp.float32, 0.0, config.world_width)),
                np.asarray(jax.random.uniform(
                    k2, (n,), jnp.float32, 0.0, config.world_height))], -1)
            radii = np.full(n, config.initial_radius, np.float32)
        if config.tile_cap == 0:
            config = config.replace(tile_cap=_auto_cap(config, positions))
        if (config.tiled_uniform_radius
                and not np.all(radii == np.float32(config.initial_radius))):
            print("[tiled] mixed radii in initial arrays: disabling "
                  "tiled_uniform_radius")
            config = config.replace(tiled_uniform_radius=False)
        self.config = config
        self.state = init_sharded_tiles(config, self.mesh, positions, radii,
                                        pids=pids, previous_positions=prev)
        self._build_compiled()
        self._steps_done = 0
        self._next_pid = (int(np.max(pids)) + 1 if pids is not None
                          and len(np.asarray(pids)) else n)
        # cumulative per-chip deferral/drop counts (i32[n_shards]) — the
        # physics-quality signal per slab.  Accumulated device-side
        # (async) so run() keeps its dispatch pipelining; read via the
        # per_chip_overflow property.
        self._drops_dev = jax.device_put(
            np.zeros(self.mesh.devices.size, np.int32),
            NamedSharding(self.mesh, P(config.mesh_axis)))
        self.timer = FrameTimer().start()
        self.mouse_pos = (0.0, 0.0)
        self.mouse_pressed = False

    def _build_compiled(self):
        """(Re)build every compiled function for self.config — called at
        construction and after a config change (e.g. the uniform-radius
        fallback on a mixed-radius spawn)."""
        config = self.config
        step_fn = make_sharded_tiled_step_fn(config, self.mesh)
        # relocate every iv-th step (tiled_relocate_interval — TiledEngine
        # parity): the off-step program skips relocation AND migration
        # (storage-only phases; see make_sharded_tiled_step_fn)
        iv = max(1, config.tiled_relocate_interval)
        step_nr_fn = (make_sharded_tiled_step_fn(config, self.mesh,
                                                 do_relocate=False)
                      if iv > 1 else step_fn)

        _step = jax.jit(step_fn, donate_argnums=0)
        # off-step program for single-step driving (TiledEngine parity:
        # the relocate interval must hold for step()/remainder paths too)
        _step_nr = (jax.jit(step_nr_fn, donate_argnums=0)
                    if iv > 1 else _step)
        self._reloc_iv = iv
        self._since_reloc = 0

        # CHUNK steps scanned inside one program (facade parity with
        # TiledEngine: the tunneled runtime costs ~5.7 ms per dispatched
        # program, which would dominate the multi-chip step otherwise);
        # per-chip deferral counts are summed across the chunk.
        self._chunks = {}

        def _group(s, p, m):
            s, drops = step_fn(s, p)
            for _ in range(m - 1):
                s, d2 = step_nr_fn(s, p)
                drops = drops + d2
            return s, drops

        def _chunk_of(k: int):
            # compiled per distinct scan length: remainder windows get a
            # scanned program instead of per-step dispatch (same
            # treatment as TiledEngine.run)
            if k not in self._chunks:
                def _chunk_fn(state, p):
                    full, rem = divmod(k, iv)
                    drops = None
                    if full:
                        def body(s, _):
                            return _group(s, p, iv)
                        state, d = jax.lax.scan(
                            body, state, None, length=full)
                        drops = d.sum(axis=0)
                    if rem:
                        state, d = _group(state, p, rem)
                        drops = d if drops is None else drops + d
                    return state, drops
                self._chunks[k] = jax.jit(_chunk_fn, donate_argnums=0)
            return self._chunks[k]
        self._chunk_of = _chunk_of
        self._chunk = _chunk_of(self.CHUNK)
        # remainder windows target the tunneled TPU runtime; on CPU each
        # distinct length is a fresh slow compile (see TiledEngine)
        self._scan_remainders = jax.default_backend() == "tpu"
        self._step = _step
        self._step_nr = _step_nr
        # periodic EXACT relocate sweep (TiledEngine parity): the pull
        # relocate is one-hop, so multi-hop-stale movers need the exact
        # claim sweep at the Morton-resort cadence as the safety net
        pallas_reloc = config.tiled_relocate == "pallas" or (
            config.tiled_relocate == "auto"
            and jax.default_backend() == "tpu")
        self._sweep_interval = config.sort_interval_steps
        if pallas_reloc and not self._sweep_interval:
            self._sweep_interval = 240
        if pallas_reloc:
            sweep_fn = make_sharded_tiled_step_fn(config, self.mesh,
                                                  relocate_only=True)
            # keep the sweep's per-chip drop counts: the multi-hop
            # straggler deferrals land exactly here, and discarding them
            # would make per_chip_overflow read zero for the hottest slabs
            self._sweep = jax.jit(sweep_fn, donate_argnums=0)
        else:
            # the jnp relocation is already exact every step
            self._sweep = None
            self._sweep_interval = 0
        self._insert_ring = {}  # ring -> compiled sharded insert round

    def params(self, dt=None):
        return StepParams.make(
            self.config.dt if dt is None else dt,
            mouse=self.mouse_pos, pressed=self.mouse_pressed)

    CHUNK = 16  # steps per scanned program in run() (TiledEngine parity)

    @property
    def per_chip_overflow(self) -> np.ndarray:
        """Cumulative deferral/drop count per chip (host fetch)."""
        return np.asarray(self._drops_dev, np.int64)

    def _maybe_sweep(self, p):
        if (self._sweep_interval and self._steps_done
                and self._steps_done % self._sweep_interval == 0):
            self.state, drops = self._sweep(self.state, p)
            self._drops_dev = self._drops_dev + drops
            self._since_reloc = 0  # the exact sweep restores storage==home

    def _single_step(self, p):
        """One step honoring the relocate interval (TiledEngine parity)."""
        off = (self._reloc_iv > 1
               and self._since_reloc < self._reloc_iv - 1)
        state, drops = (self._step_nr if off else self._step)(self.state, p)
        self._since_reloc = self._since_reloc + 1 if off else 0
        return state, drops

    def step(self, params=None):
        p = params or self.params()
        self._maybe_sweep(p)
        self.state, drops = self._single_step(p)
        self._drops_dev = self._drops_dev + drops
        self._steps_done += 1
        return self.state

    def run(self, n_steps: int):
        p = self.params()
        done = 0
        while done < n_steps:
            self._maybe_sweep(p)
            bound = n_steps - done
            # stay inside the sweep cadence (TiledEngine parity)
            if self._sweep_interval:
                rem = self._steps_done % self._sweep_interval
                bound = min(bound, self._sweep_interval - rem
                            if rem else self._sweep_interval)
            window = False
            if bound >= self.CHUNK:
                self.state, drops = self._chunk(self.state, p)
                took = self.CHUNK
                window = True
            elif bound > 1 and self._scan_remainders:
                self.state, drops = self._chunk_of(bound)(self.state, p)
                took = bound
                window = True
            else:
                self.state, drops = self._single_step(p)
                took = 1
            if window:
                # windows relocate first, then group by iv: the tail of
                # a length-L window has (L-1) % iv un-relocated steps
                self._since_reloc = ((took - 1) % self._reloc_iv
                                     if self._reloc_iv > 1 else 0)
            self._drops_dev = self._drops_dev + drops
            self._steps_done += took
            done += took
            self.timer.get_delta(frames=took)
        return self.state

    def press_mouse(self, world_pos):
        self.mouse_pos = tuple(map(float, world_pos))
        self.mouse_pressed = True

    def release_mouse(self):
        self.mouse_pressed = False

    def move_mouse(self, world_pos):
        self.mouse_pos = tuple(map(float, world_pos))

    def spawn_at(self, world_pos, count=None, verbose: bool = True):
        from gpu_physics_engine_tpu.ops.spawn import ring_burst

        count = count or self.config.spawn_burst
        r_hi = int(min(3.0, self.config.tile_max_radius_effective))
        if r_hi < 1:
            raise ValueError("spawning needs tile_max_radius >= 1")
        kring, self._key = jax.random.split(self._key)
        sx, sy, radii = ring_burst(kring, world_pos[0], world_pos[1],
                                   count, max_spawn_radius=r_hi)
        sx = jnp.clip(sx, 0.0, self.config.world_width - 1e-3)
        sy = jnp.clip(sy, 0.0, self.config.world_height - 1e-3)
        ids = jnp.arange(count, dtype=jnp.int32) + self._next_pid
        self._next_pid += count
        if self.config.tiled_uniform_radius and bool(np.any(
                np.asarray(radii)
                != np.float32(self.config.initial_radius))):
            # spawned radii break the uniform-radius premise — the
            # constant-rsum sweep would resolve their pairs as if they
            # were initial_radius (TiledEngine parity fallback)
            print("[tiled] spawn with non-uniform radii: disabling "
                  "tiled_uniform_radius")
            self.config = self.config.replace(tiled_uniform_radius=False)
            self._build_compiled()
        self._spawn_insert(jnp.stack([sx, sy], -1), radii, ids)
        if verbose:
            print(f"Total particles: {self.num_particles()}")
        return self.state

    def _insert_fns(self):
        """(ring1, place_at) compiled insert programs, built on first
        use (TiledEngine._insert_fns parity, sharded flavors)."""
        fns = self._insert_ring.get("fns")
        if fns is None:
            fns = (make_sharded_insert(self.config, self.mesh),
                   make_sharded_place_at(self.config, self.mesh))
            self._insert_ring["fns"] = fns
        return fns

    def _spawn_insert(self, pos, radii, ids):
        """TiledEngine._spawn_insert parity: ring-1 fallback in-program
        (placed mask psum-synced, so cross-slab fallbacks can neither
        lose nor duplicate), then the rare far spill via host-chosen
        targets — the reference never refuses a spawn.  Shared flow:
        ops/tiled.spawn_insert_into (the sharded free-count download
        gathers across slabs transparently)."""
        ring1, place_at = self._insert_fns()
        return tiled.spawn_insert_into(self, ring1, place_at,
                                       pos, radii, ids)

    def num_particles(self) -> int:
        return int(self.state.num_active)

    def _export(self):
        from gpu_physics_engine_tpu.ops.tiled import export_particles
        return export_particles(self.state)

    def positions(self):
        return self._export()[1]

    def previous_positions(self):
        return self._export()[2]

    def radii(self):
        return self._export()[3]

    def velocities(self):
        _, pos, prev, _ = self._export()
        return pos - prev

    def cell_size(self) -> float:
        return tiled.tile_geometry(self.config)[0]

    # ---- checkpoint / resume (cross-topology: the tiled checkpoint
    # stores pid-ordered particle arrays, not the layout, so a state
    # saved on N chips resumes on M chips — or on the single-chip
    # TiledEngine — and vice versa).  Engine-level per-chip deferral
    # counters (per_chip_overflow) restart at zero on resume; the
    # state's cumulative overflow_count is part of the checkpoint. ----

    def save_checkpoint(self, path: str) -> None:
        from gpu_physics_engine_tpu.utils.checkpoint import (
            save_tiled_checkpoint)
        save_tiled_checkpoint(path, self.state, self.config)

    @classmethod
    def from_checkpoint(cls, path: str, mesh: Mesh = None, seed: int = 0,
                        **config_overrides) -> "ShardedTiledEngine":
        from gpu_physics_engine_tpu.utils.checkpoint import (
            load_tiled_bigs, peek_tiled_config)
        if load_tiled_bigs(path) is not None:
            raise ValueError(
                "checkpoint carries a big-particle overlay; the sharded "
                "engine has no overlay support — resume on the "
                "single-chip TiledEngine")
        config = peek_tiled_config(path)
        if config_overrides:
            config = config.replace(**config_overrides)
        with np.load(path) as z:
            arrays = (z["positions"], z["radii"], z["pid"],
                      z["previous_positions"])
            eng = cls(config, mesh=mesh, seed=seed, initial_arrays=arrays)
            eng.state = dataclasses.replace(
                eng.state,
                overflow_count=eng.state.overflow_count
                + jnp.asarray(z["overflow"], jnp.int32))
        return eng
