"""Multi-chip spatial sharding: slab decomposition + ICI halo exchange.

Net-new capability (BASELINE.json config 5; the reference is single-device,
SURVEY.md §2.4).  The world is cut into N vertical slabs, one per chip of a
1D ``jax.sharding.Mesh``; each chip owns the particles whose x lies in its
slab.  Per step, inside ``jax.shard_map``:

  1. **Halo exchange** — particles within ``2*cell_size`` of a slab edge are
     packed into fixed-size buffers and sent to the neighbor chip with
     ``jax.lax.ppermute`` (XLA lowers this to ICI point-to-point).
  2. **Local solve** — each chip runs the same broad phase + 4-color solve
     as the single-chip engine over its own + halo particles (global cell
     coordinates, so cells straddling a boundary look identical from both
     sides); halo rows' corrections are computed and discarded — the
     neighbor computes the same pairs and keeps its own rows.
  3. **Integration** on owned particles only.
  4. **Migration** — particles that crossed a slab boundary are packed,
     ppermuted, and placed into free slots on the receiving chip.

Slots are a fixed-capacity pool with an ``alive`` mask (no compaction);
halo/migration buffers are fixed-size with drop counting, so every shape is
static and the whole step jits into one SPMD program.  Known v1 deviations,
all counted in diagnostics rather than silent: halo/migration overflow
drops, and cross-boundary pairs resolve Jacobi-style between chips (each
side applies its own half) instead of the single-chip sequential order.

SCOPE: this module is the reference-dataflow multi-chip path — sorted
arrays, colored solve, cell size pinned to min_cell_size — kept for
semantics validation and as the array-engine analog.  The PRODUCTION
multi-chip path is parallel/tiled_shard.py (tile-row slabs, fused Pallas
substep, pull relocation, scan-chunked run, lossless two-phase-commit
migration); benchmarks and the multichip dryrun exercise that one.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import StepParams
from gpu_physics_engine_tpu.ops import collision, grid, integrate

_I32 = jnp.int32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "px", "py", "radius", "alive", "dropped",
                 "steps_since_sort"],
    meta_fields=[],
)
@dataclasses.dataclass
class ShardedState:
    """Particle pool sharded over the mesh's leading axis.

    Arrays are [n_shards * slots_per_shard]; ``alive`` marks live slots
    (free-list pool, unlike the single-chip active-prefix layout).
    ``dropped`` counts halo/migration buffer overflows per shard."""
    x: jax.Array
    y: jax.Array
    px: jax.Array
    py: jax.Array
    radius: jax.Array
    alive: jax.Array
    dropped: jax.Array           # i32[n_shards]
    steps_since_sort: jax.Array  # i32[n_shards]


def _pack(mask, arrays, n_slots: int):
    """Compact masked rows into n_slots (ascending index order).

    Returns (packed arrays, valid[n_slots], packed_mask, n_dropped)."""
    rank = jnp.cumsum(mask.astype(_I32)) - 1
    fits = mask & (rank < n_slots)
    idx = jnp.where(fits, rank, n_slots)
    packed = [jnp.zeros((n_slots + 1,), a.dtype).at[idx].set(
        jnp.where(mask, a, jnp.zeros((), a.dtype)))[:n_slots] for a in arrays]
    valid = jnp.zeros((n_slots + 1,), bool).at[idx].set(fits)[:n_slots]
    dropped = jnp.sum(mask.astype(_I32)) - jnp.sum(fits.astype(_I32))
    return packed, valid, fits, dropped


def _place(alive, locals_, incoming, valid):
    """Write incoming rows into free slots. Returns (alive, arrays, dropped)."""
    cap = alive.shape[0]
    m = valid.shape[0]
    free = ~alive
    frank = jnp.cumsum(free.astype(_I32)) - 1
    slot_idx = jnp.where(free & (frank < m), frank, m)
    slots = jnp.full((m + 1,), cap, _I32).at[slot_idx].set(
        jnp.arange(cap, dtype=_I32))[:m]
    dest = jnp.where(valid & (slots < cap), slots, cap)
    out = [a.at[dest].set(inc, mode="drop") for a, inc in zip(locals_, incoming)]
    placed = valid & (slots < cap)
    alive = alive.at[dest].set(True, mode="drop")
    dropped = jnp.sum(valid.astype(_I32)) - jnp.sum(placed.astype(_I32))
    return alive, out, dropped


def make_sharded_step(config: SimConfig, mesh: Mesh):
    """Build the jitted SPMD step over `mesh` (1D, axis config.mesh_axis)."""
    axis = config.mesh_axis
    n = mesh.devices.size
    slab_w = config.world_width / n
    # v1: cell size fixed at the static initial value (sharded runs don't
    # spawn larger particles; see ops/spawn.py for the single-chip path).
    cs = config.min_cell_size
    margin = 2.0 * cs
    H = config.halo_capacity
    M = config.migration_capacity

    def local_step(x, y, px, py, r, alive, dropped, since_sort,
                   params: StepParams):
        d = jax.lax.axis_index(axis)
        lo = d.astype(jnp.float32) * slab_w
        hi = lo + slab_w
        cap_l = x.shape[0]
        total_dropped = jnp.int32(0)

        # ---- 0. periodic per-shard Morton resort (C9 analog; also
        # compacts the alive pool: dead slots carry UNUSED keys and sink) ----
        if config.sort_interval_steps > 0:
            from gpu_physics_engine_tpu.core.config import UNUSED_CELL_ID
            from gpu_physics_engine_tpu.ops import morton
            from gpu_physics_engine_tpu.ops.sort import argsort_u32

            def resort(args):
                x, y, px, py, r, alive = args
                cx = jnp.floor(x / cs).astype(jnp.int32)
                cy = jnp.floor(y / cs).astype(jnp.int32)
                keys = jnp.where(alive, morton.morton_encode(cx, cy),
                                 jnp.uint32(UNUSED_CELL_ID))
                _, perm = argsort_u32(keys, impl=config.sort_impl)
                return tuple(jnp.take(a, perm, axis=0)
                             for a in (x, y, px, py, r, alive))

            do = since_sort[0] >= config.sort_interval_steps
            x, y, px, py, r, alive = jax.lax.cond(
                do, resort, lambda a: a, (x, y, px, py, r, alive))
            since_sort = jnp.where(do, 0, since_sort)

        # ---- 1. halo exchange (x, y, r of boundary particles) ----
        def exchange(mask, perm):
            (hx, hy, hr), valid, _, drp = _pack(mask, (x, y, r), H)
            outs = [jax.lax.ppermute(v, axis, perm) for v in (hx, hy, hr, valid)]
            return outs, drp

        to_left = alive & (x < lo + margin)
        to_right = alive & (x >= hi - margin)
        left_perm = [(i, i - 1) for i in range(1, n)]    # send to left neighbor
        right_perm = [(i, i + 1) for i in range(n - 1)]  # send to right neighbor
        (rxl, ryl, rrl, rvl), d1 = exchange(to_right, right_perm)  # recv from left
        (rxr, ryr, rrr, rvr), d2 = exchange(to_left, left_perm)    # recv from right
        total_dropped += d1 + d2

        cx = jnp.concatenate([x, rxl, rxr])
        cy = jnp.concatenate([y, ryl, ryr])
        cr = jnp.concatenate([r, rrl, rrr])
        calive = jnp.concatenate([alive, rvl, rvr])

        # ---- 2. broad phase + colored solve on own + halo ----
        cand = grid.build_candidates(cx, cy, cr, calive, jnp.float32(cs))
        sc, so = grid.sort_map(*grid.build_cell_ids(cand))
        table = collision.occupants_from_sorted(sc, so, config.max_occupancy)
        sx, sy = collision.solve_colored(
            cx, cy, cr, table, jnp.float32(config.stiffness))
        x1, y1 = sx[:cap_l], sy[:cap_l]

        # ---- 3. integrate owned particles ----
        x2, y2, px2, py2 = integrate.verlet_integrate(
            x1, y1, px, py, r, alive, params, config)

        # ---- 4. migration of boundary crossers ----
        out_left = alive & (x2 < lo)
        out_right = alive & (x2 >= hi)

        def migrate(mask, perm):
            packed, valid, fits, drp = _pack(mask, (x2, y2, px2, py2, r), M)
            sent = [jax.lax.ppermute(v, axis, perm) for v in (*packed, valid)]
            return sent[:-1], sent[-1], fits, drp

        (inc_l, vl, fit_l, d3) = migrate(out_right, right_perm)
        (inc_r, vr, fit_r, d4) = migrate(out_left, left_perm)
        total_dropped += d3 + d4
        alive2 = alive & ~(fit_l | fit_r)

        locals_ = [x2, y2, px2, py2, r]
        alive2, locals_, d5 = _place(alive2, locals_, inc_l, vl)
        alive2, locals_, d6 = _place(alive2, locals_, inc_r, vr)
        total_dropped += d5 + d6
        x3, y3, px3, py3, r3 = locals_

        return (x3, y3, px3, py3, r3, alive2,
                dropped + total_dropped[None], since_sort + 1)

    sharded = P(axis)
    rep = P()
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(sharded,) * 8 + (rep,),
        out_specs=(sharded,) * 8,
    )

    @jax.jit
    def step(state: ShardedState, params: StepParams) -> ShardedState:
        out = mapped(state.x, state.y, state.px, state.py,
                     state.radius, state.alive, state.dropped,
                     state.steps_since_sort, params)
        return ShardedState(*out)

    return step


def init_sharded(config: SimConfig, mesh: Mesh, positions, radii,
                 slots_per_shard: int) -> ShardedState:
    """Distribute particles to slab owners (host-side, init only)."""
    axis = config.mesh_axis
    n = mesh.devices.size
    slab_w = config.world_width / n
    positions = np.asarray(positions, np.float32).reshape(-1, 2)
    radii = np.asarray(radii, np.float32).reshape(-1)

    cap = n * slots_per_shard
    x = np.zeros(cap, np.float32)
    y = np.zeros(cap, np.float32)
    r = np.zeros(cap, np.float32)
    alive = np.zeros(cap, bool)
    owner = np.clip((positions[:, 0] // slab_w).astype(np.int64), 0, n - 1)
    for s in range(n):
        mine = np.nonzero(owner == s)[0][:slots_per_shard]
        base = s * slots_per_shard
        sl = slice(base, base + len(mine))
        x[sl] = positions[mine, 0]
        y[sl] = positions[mine, 1]
        r[sl] = radii[mine]
        alive[sl] = True

    shard = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(a, shard)
    return ShardedState(
        x=put(x), y=put(y), px=put(x.copy()), py=put(y.copy()),
        radius=put(r), alive=put(alive),
        dropped=put(np.zeros(n, np.int32)),
        steps_since_sort=put(np.zeros(n, np.int32)),
    )


def gather_alive(state: ShardedState):
    """Host download of live particles (positions, radii) for inspection."""
    alive = np.asarray(state.alive)
    pos = np.stack([np.asarray(state.x), np.asarray(state.y)], -1)
    return pos[alive], np.asarray(state.radius)[alive]
