"""Narrow phase: collision-cell extraction + positional solvers.

Replaces reference components C13-C16 (src/physics/): the chunked run
counter (collision_cell_builder.wgsl:27-85), prefix-sum compaction
(collision_cell_builder.rs:226-229), indirect dispatch sizing
(collision_cell_builder.wgsl:96-109) and the 4-color Gauss-Seidel solver
(collision_solver.wgsl:26-118).

TPU-native shape of the same ideas:

  * Collision cells (runs of >= 2 occupants in the sorted pair array) are
    found with vectorized boundary masks + a prefix sum — no chunks, no
    indirect dispatch; XLA computes over the full static extent with masks.
  * The 4-color checkerboard schedule survives intact: cell color
    1 + (cx%2) + 2*(cy%2) (collision_solver.wgsl:55-58).  Within one color,
    cells share no particles (cell_size >= 2*max_radius, SURVEY.md §2.3), so
    per-cell local updates can be scattered back without conflicts.
  * Within a cell, pair corrections are applied **sequentially** in ascending
    (i, j) occupant order on local copies — exactly the reference's
    Gauss-Seidel loop (collision_solver.wgsl:66-118) — then written back.
  * ``solve_jacobi`` is the alternative gather-only solver: each particle
    accumulates its own correction from the 3x3 neighbor cells of a
    home-only bucket table.  No scatter at all; fastest path, symmetric
    (Jacobi) update order instead of the reference's.

Occupancy is clamped to K = SimConfig.max_occupancy with overflow counting
(the reference's loops are unbounded; XLA needs a static bound).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig, UNUSED_CELL_ID
from gpu_physics_engine_tpu.ops import morton
from gpu_physics_engine_tpu.ops.grid import Buckets, Candidates, linear_cell_ids
from gpu_physics_engine_tpu.ops.scan import inclusive_scan

_I32 = jnp.int32
_U32 = jnp.uint32

MIN_DISTANCE = 1e-4  # reference: `distance > 0.0001` (collision_solver.wgsl:95)


# ---------------------------------------------------------------------------
# Collision-cell extraction on sorted pairs (reference C14 observable output)
# ---------------------------------------------------------------------------

def run_starts(sorted_cells: jax.Array) -> jax.Array:
    """bool[4N]: first element of every run of equal, used cell ids."""
    valid = sorted_cells != _U32(UNUSED_CELL_ID)
    prev = jnp.concatenate([_U32([UNUSED_CELL_ID]), sorted_cells[:-1]])
    return valid & (sorted_cells != prev)


def collision_cell_mask(sorted_cells: jax.Array) -> jax.Array:
    """bool[4N]: run starts whose run has >= 2 occupants ("collision cells")."""
    nxt = jnp.concatenate([sorted_cells[1:], _U32([UNUSED_CELL_ID])])
    return run_starts(sorted_cells) & (nxt == sorted_cells)


def build_collision_cells(sorted_cells: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Compacted start indices of collision cells + total count.

    Mirrors the observable output of CollisionCellBuilder (the
    collision_cells buffer: ordered run-start indices, UNUSED-padded,
    collision_cell_builder.wgsl:111-190; total = last element of the scanned
    chunk counts, collision_solver.wgsl:48-53) without the chunked counting —
    offsets come from one prefix sum over the boundary mask.
    """
    mask = collision_cell_mask(sorted_cells)
    n = sorted_cells.shape[0]
    total = jnp.sum(mask.astype(_I32))
    # Stable compaction: position of each marked index = exclusive prefix.
    offsets = inclusive_scan(mask.astype(_I32)) - 1
    out = jnp.full(n, _U32(UNUSED_CELL_ID))
    idx = jnp.arange(n, dtype=_I32)
    # masked rows get DISTINCT out-of-bounds destinations (n + idx) so the
    # scatter is honestly unique_indices — non-unique scatters serialize on
    # TPU (measured 10ms -> sub-ms at 64k)
    dst = jnp.where(mask, offsets, n + idx)
    out = out.at[dst].set(idx.astype(_U32), mode="drop", unique_indices=True)
    return out, total


# ---------------------------------------------------------------------------
# Occupant tables — the common currency of both pipelines
# ---------------------------------------------------------------------------

class OccupantTable(NamedTuple):
    """Cell occupant lists in ascending object-id order.

    obj:      i32[M, K] occupant object ids (0 where invalid)
    valid:    bool[M, K]
    color:    i32[M] checkerboard color 1..4 of the cell
    active:   bool[M] row is a collision cell (>= 2 occupants)
    overflow: i32[] occupants beyond K, summed
    """
    obj: jax.Array
    valid: jax.Array
    color: jax.Array
    active: jax.Array
    overflow: jax.Array


def occupants_from_sorted(sorted_cells, sorted_objs, K: int,
                          max_cells: int | None = None) -> OccupantTable:
    """Occupant table of the collision cells in the sorted pair array.

    Collision-cell start indices are first compacted to ``max_cells`` rows
    (default: len/4 = one per particle slot — comfortably above observed
    densities; every 4-slot group contributes at most 2 runs of length >= 2,
    so the hard bound is len/2), then occupants are gathered per row.  This
    keeps the solver's row count O(N) instead of O(4N) and is the analog of
    the reference's compaction into the collision_cells buffer
    (collision_cell_builder.wgsl:111-190).  Dropped cells (beyond max_cells)
    and runs longer than K are both counted in ``overflow``.
    """
    n = sorted_cells.shape[0]
    if max_cells is None:
        max_cells = n // 4
    starts_idx, total = build_collision_cells(sorted_cells)
    starts_idx = starts_idx[:max_cells].astype(_I32)
    active = jnp.arange(max_cells, dtype=_I32) < total
    s = jnp.where(active, starts_idx, 0)

    cols, valids = [], []
    cell0 = sorted_cells[s]
    for k in range(K):
        j = jnp.minimum(s + k, n - 1)
        same = (sorted_cells[j] == cell0) & ((s + k) < n) & active
        cols.append(jnp.where(same, sorted_objs[j], 0))
        valids.append(same)
    obj = jnp.stack(cols, axis=-1)
    valid = jnp.stack(valids, axis=-1)
    # overflow: run extends past K, or collision cells beyond max_cells
    jK = jnp.minimum(s + K, n - 1)
    over = active & (sorted_cells[jK] == cell0) & ((s + K) < n)
    dropped_cells = jnp.maximum(total - max_cells, 0)
    cx, cy = morton.morton_decode(cell0)
    color = (1 + (cx & 1) + 2 * (cy & 1)).astype(_I32)
    return OccupantTable(
        obj=obj, valid=valid, color=color, active=active,
        overflow=jnp.sum(over.astype(_I32)) + dropped_cells,
    )


def occupants_from_buckets(buckets: Buckets, config: SimConfig) -> OccupantTable:
    """One row per grid cell; active where >= 2 occupants."""
    nx, _ = config.grid_dims
    obj, valid = buckets.occupants()
    count = jnp.sum(valid.astype(_I32), axis=-1)
    lin = jnp.arange(config.num_cells, dtype=_I32)
    cx = lin % nx - 1   # undo the -1 border offset (ops/grid.py linear_cell_ids)
    cy = lin // nx - 1  # (cx & 1) of -1 is 1, matching the u32 wrap the
    #                     reference's color function sees (collision_solver.wgsl:55-58)
    color = (1 + (cx & 1) + 2 * (cy & 1)).astype(_I32)
    return OccupantTable(
        obj=obj, valid=valid & (count >= 2)[:, None], color=color,
        active=count >= 2, overflow=buckets.overflow,
    )


# ---------------------------------------------------------------------------
# Solvers
# ---------------------------------------------------------------------------

def _pair_correction(xi, yi, ri, xj, yj, rj, stiffness, one=None):
    """Positional correction of one (i, j) pair (collision_solver.wgsl:91-111).

    Returns (dx_i, dy_i, dx_j, dy_j, colliding).  ``one`` is an optional
    TRACED 1.0 (see ops/gs_tiled._noc): XLA contracts mul+add chains into
    fused multiply-adds, which is 1 ulp off the scalar golden model on
    ~1% of pairs; multiplying the addends by a traced 1.0 keeps any
    contraction exact.  Callers without a bit-parity claim may omit it
    (the constant is folded away)."""
    if one is None:
        one = jnp.float32(1.0)
    dx = xi - xj
    dy = yi - yj
    dist = jnp.sqrt(dx * dx * one + dy * dy * one)
    rsum = ri + rj
    colliding = (rsum * rsum > dist * dist) & (dist > MIN_DISTANCE)
    safe = jnp.maximum(dist, MIN_DISTANCE)
    pen = rsum - dist
    cx = dx / safe * pen * stiffness
    cy = dy / safe * pen * stiffness
    # inverse-mass split: inv_m = 1/r → weight_i = rj/(ri+rj)
    wi = rj / jnp.maximum(rsum, MIN_DISTANCE)
    wj = ri / jnp.maximum(rsum, MIN_DISTANCE)
    return (cx * wi * one, cy * wi * one,
            cx * wj * one, cy * wj * one, colliding)


def solve_colored(x, y, radius, table: OccupantTable, stiffness: float,
                  num_colors: int = 4):
    """4-color Gauss-Seidel positional solve — reference semantics.

    For each color pass (collision_solver.rs:224-242): load the occupant
    positions of that color's collision cells into local per-slot vectors,
    run the sequential ascending (i, j) pair sweep on the locals (so later
    pairs see earlier corrections, as in the reference's in-thread loop),
    then scatter the locals back.  Same-color cells are particle-disjoint
    (SURVEY.md §2.3), so the scatter is conflict-free.
    """
    K = table.obj.shape[1]
    cap = x.shape[0]
    rows = table.obj.shape[0]
    # distinct out-of-bounds destinations for masked rows: scatter stays
    # unique_indices (non-unique scatters serialize on TPU)
    oob = cap + jnp.arange(rows, dtype=jnp.int32)
    # traced 1.0: fma-contraction guard for the bit-parity oracle.  The
    # predicate must be traced (or XLA folds it and re-contracts) yet
    # NEVER false: table.color = 1 + (cx&1) + 2*(cy&1) is an int in
    # [1, 4] for ANY cx/cy, with no NaN failure mode — unlike the old
    # isfinite(x[0]), which would flip to 2.0 and double every
    # correction if particle 0 alone went non-finite.
    one = jnp.where(table.color.reshape(-1)[0] >= 0,
                    jnp.float32(1.0), jnp.float32(2.0))

    for c in range(1, num_colors + 1):
        sel = table.active & (table.color == c)
        svalid = [table.valid[:, k] & sel for k in range(K)]
        oid = [jnp.where(svalid[k], table.obj[:, k], 0) for k in range(K)]
        lx = [x[oid[k]] for k in range(K)]
        ly = [y[oid[k]] for k in range(K)]
        lr = [radius[oid[k]] for k in range(K)]
        for i in range(K - 1):
            for j in range(i + 1, K):
                dxi, dyi, dxj, dyj, hit = _pair_correction(
                    lx[i], ly[i], lr[i], lx[j], ly[j], lr[j], stiffness,
                    one=one)
                apply = hit & svalid[i] & svalid[j]
                lx[i] = jnp.where(apply, lx[i] + dxi, lx[i])
                ly[i] = jnp.where(apply, ly[i] + dyi, ly[i])
                lx[j] = jnp.where(apply, lx[j] - dxj, lx[j])
                ly[j] = jnp.where(apply, ly[j] - dyj, ly[j])
        for k in range(K):
            dst = jnp.where(svalid[k], oid[k], oob)
            x = x.at[dst].set(lx[k], mode="drop", unique_indices=True)
            y = y.at[dst].set(ly[k], mode="drop", unique_indices=True)
    return x, y


def solve_jacobi(x, y, radius, home_buckets: Buckets, cand: Candidates,
                 config: SimConfig, active):
    """Gather-only Jacobi solve over the 3x3 neighborhood of home cells.

    Each particle sums its own half of every overlapping pair's correction;
    no scatter, no coloring.  Pairs are each found exactly once per side
    because home cells are unique (home-only buckets).
    """
    nx, ny = config.grid_dims
    K = config.max_occupancy
    entries = home_buckets.entries  # [num_cells, K]
    hx = cand.coords[:, 0, 0]
    hy = cand.coords[:, 0, 1]
    me = jnp.arange(x.shape[0], dtype=_I32)

    acc_x = jnp.zeros_like(x)
    acc_y = jnp.zeros_like(y)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ncx = hx + dx
            ncy = hy + dy
            # home cells have coords >= 0; the -1 border rows hold no home
            # buckets, so skip them (offset +1 matches linear_cell_ids)
            in_range = (ncx >= 0) & (ncx < nx - 1) & (ncy >= 0) & (ncy < ny - 1)
            lin = jnp.where(in_range, (ncy + 1) * nx + (ncx + 1), 0)
            for k in range(K):
                enc = entries[lin, k]
                j = enc >> 2
                ok = in_range & (enc != jnp.int32(0x7FFFFFFF)) & (j != me) & active
                jj = jnp.where(ok, j, 0)
                cxi, cyi, _, _, hit = _pair_correction(
                    x, y, radius, x[jj], y[jj], radius[jj],
                    jnp.float32(1.0))
                apply = ok & hit
                acc_x = jnp.where(apply, acc_x + cxi, acc_x)
                acc_y = jnp.where(apply, acc_y + cyi, acc_y)
    stiff = jnp.float32(config.stiffness)
    return x + acc_x * stiff, y + acc_y * stiff
