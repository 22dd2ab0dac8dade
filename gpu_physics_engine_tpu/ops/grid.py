"""Uniform spatial grid broad phase.

Replaces reference component C12 (src/grid/grid.rs + grid.wgsl): every step,
each particle reports the cells it overlaps — its home (H) cell plus up to 3
phantom (P) neighbor cells found by a circle-vs-AABB test (grid.wgsl:38-129)
— and the engine groups co-located particles.

Two TPU-native groupings, selected by SimConfig.pipeline:

  1. "sorted" — parity with the reference dataflow: a flat 4N array of
     (morton cell id, object id) candidate pairs with UNUSED=0xFFFFFFFF
     padding, stably sorted by cell id (grid.rs:310-312).  Runs of equal ids
     are then the cell occupant lists.

  2. "bucket" — the fast path, no global sort: a dense [num_cells, K] table
     of occupant slots built with K rounds of deterministic scatter-min
     ("lowest object id wins slot k").  Row-major linear cell ids; XLA
     scatter/gather instead of sort.  K = SimConfig.max_occupancy; overflow
     beyond K is counted, never silently dropped.

Both produce occupant lists in ascending object order, which is what makes
the colored Gauss-Seidel solve bit-match across pipelines (the reference's
stable radix sort yields the same order, SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig, UNUSED_CELL_ID
from gpu_physics_engine_tpu.ops import morton
from gpu_physics_engine_tpu.ops.sort import sort_pairs

_U32 = jnp.uint32
_I32 = jnp.int32

# Encoded bucket entries are obj_id * 4 + candidate_slot; EMPTY sorts last.
# (plain int: module-level jnp constants would initialize the backend at
# import time, which blocks when the TPU tunnel is down)
BUCKET_EMPTY = 0x7FFFFFFF

# Candidate-neighbor scan order matches the reference loop
# (grid.wgsl:68-88: y from -1 to 1, x from -1 to 1, skipping (0,0)).
_NEIGHBOR_OFFSETS = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                     if not (dx == 0 and dy == 0)]


def home_cells(x, y, cell_size):
    """Integer grid coords of each particle's home cell (grid.wgsl:52)."""
    cx = jnp.floor(x / cell_size).astype(_I32)
    cy = jnp.floor(y / cell_size).astype(_I32)
    return cx, cy


def _circle_in_cell(x, y, sq_radius, ncx, ncy, cell_size):
    """Strict circle-vs-cell-AABB overlap test (grid.wgsl:117-129)."""
    lo_x = ncx.astype(jnp.float32) * cell_size
    lo_y = ncy.astype(jnp.float32) * cell_size
    closest_x = jnp.clip(x, lo_x, lo_x + cell_size)
    closest_y = jnp.clip(y, lo_y, lo_y + cell_size)
    dx = x - closest_x
    dy = y - closest_y
    return dx * dx + dy * dy < sq_radius


class Candidates(NamedTuple):
    """Per-particle candidate cells, 4 slots each (slot 0 = home).

    cells:   u32[cap, 4] morton codes, UNUSED_CELL_ID for empty slots
    coords:  i32[cap, 4, 2] integer cell coords (for bucket linear ids / colors)
    valid:   bool[cap, 4]
    """
    cells: jax.Array
    coords: jax.Array
    valid: jax.Array


def build_candidates(x, y, radius, active, cell_size) -> Candidates:
    """H + phantom candidate cells for every particle slot.

    Phantom cells are compacted into slots 1..3 in neighbor scan order, the
    same packing the reference writes (grid.wgsl:58-94), so the pre-sort
    cell_ids layout is directly comparable in golden tests.
    """
    cap = x.shape[0]
    sq_r = radius * radius
    hx, hy = home_cells(x, y, cell_size)

    cells = [morton.morton_encode(hx, hy)]
    coords = [jnp.stack([hx, hy], axis=-1)]
    valids = [active]

    # Evaluate the 8 neighbor tests, then compact the hits into 3 slots.
    hit_cells, hit_coords, hits = [], [], []
    for dx, dy in _NEIGHBOR_OFFSETS:
        ncx, ncy = hx + dx, hy + dy
        hit = _circle_in_cell(x, y, sq_r, ncx, ncy, cell_size) & active
        hits.append(hit)
        hit_cells.append(morton.morton_encode(ncx, ncy))
        hit_coords.append(jnp.stack([ncx, ncy], axis=-1))
    hits = jnp.stack(hits, axis=-1)                    # [cap, 8]
    hit_cells = jnp.stack(hit_cells, axis=-1)          # [cap, 8]
    hit_coords = jnp.stack(hit_coords, axis=-2)        # [cap, 8, 2]
    # rank of each hit among this particle's hits (0-based), in scan order
    rank = jnp.cumsum(hits.astype(_I32), axis=-1) - 1  # [cap, 8]

    for slot in range(3):
        take = hits & (rank == slot)                   # at most one True per row
        any_take = jnp.any(take, axis=-1)
        cell = jnp.where(
            take, hit_cells, _U32(0)
        ).max(axis=-1)  # select the single hit (others are 0)
        coord = jnp.where(take[..., None], hit_coords, 0).sum(axis=-2)
        cells.append(jnp.where(any_take, cell, _U32(UNUSED_CELL_ID)))
        coords.append(coord)
        valids.append(any_take)

    cells = jnp.stack(cells, axis=-1)
    cells = jnp.where(jnp.stack(valids, axis=-1), cells, _U32(UNUSED_CELL_ID))
    return Candidates(
        cells=cells,
        coords=jnp.stack(coords, axis=-2),
        valid=jnp.stack(valids, axis=-1),
    )


# ---------------------------------------------------------------------------
# Pipeline 1: sorted (cell, object) pairs — the reference dataflow
# ---------------------------------------------------------------------------

def build_cell_ids(cand: Candidates) -> Tuple[jax.Array, jax.Array]:
    """Flatten candidates to the reference's 4N pair layout.

    cell_ids u32[4*cap] (UNUSED padded), object_ids i32[4*cap] — the direct
    analog of Grid::build_cell_ids output (grid.rs:296-306).
    """
    cap = cand.cells.shape[0]
    cell_ids = cand.cells.reshape(-1)
    object_ids = jnp.repeat(jnp.arange(cap, dtype=_I32), 4)
    return cell_ids, object_ids


def sort_map(cell_ids, object_ids, impl: str = "lax"):
    """Stable sort of the pair arrays by cell id (grid.rs:310-312)."""
    return sort_pairs(cell_ids, object_ids, impl=impl)


# ---------------------------------------------------------------------------
# Pipeline 2: dense cell buckets — TPU-native fast path
# ---------------------------------------------------------------------------

class Buckets(NamedTuple):
    """Dense occupant table.

    entries:  i32[num_cells, K] encoded obj*4+slot, BUCKET_EMPTY when vacant,
              ascending within a row (so occupant order = ascending obj id)
    overflow: i32[] number of candidate entries that did not fit in K slots
    """
    entries: jax.Array
    overflow: jax.Array

    def occupants(self) -> Tuple[jax.Array, jax.Array]:
        """(obj_ids i32[num_cells, K], valid bool[num_cells, K])."""
        valid = self.entries != BUCKET_EMPTY
        return jnp.where(valid, self.entries >> 2, 0), valid


def linear_cell_ids(coords, valid, config: SimConfig):
    """Row-major linear cell id for bucket indexing; num_cells for invalid.

    Uses the static grid stride from config.grid_dims — valid for any
    runtime cell_size >= config.min_cell_size (see SimConfig.grid_dims).
    The grid has a one-cell border at coordinate -1: phantom cells of
    particles hugging the world's low edges live there (positions are
    clamped to >= radius, but a circle still overlaps cell -1 when
    x - r < 0), and the reference resolves pairs in those cells too.

    One reference quirk reproduced deliberately: cell (-1,-1) morton-encodes
    to 0xFFFFFFFF == UNUSED_CELL_ID (grid.wgsl:112 casts the negative coord
    to u32), so the reference silently skips it — we exclude it as well to
    stay trajectory-identical across pipelines.
    """
    nx, ny = config.grid_dims
    cx, cy = coords[..., 0], coords[..., 1]
    in_range = (cx >= -1) & (cx < nx - 1) & (cy >= -1) & (cy < ny - 1) & valid
    in_range = in_range & ~((cx == -1) & (cy == -1))
    lin = (cy + 1) * nx + (cx + 1)
    return jnp.where(in_range, lin, config.num_cells), in_range


def build_buckets(cand: Candidates, config: SimConfig,
                  home_only: bool = False) -> Buckets:
    """Scatter candidates into a dense [num_cells, K] occupant table.

    K rounds of deterministic scatter-min: in round k every unplaced
    candidate proposes its encoded id for slot k of its cell; the minimum
    (lowest object id) wins, winners retire.  After K rounds any cell with
    more than K candidates leaves the surplus unplaced — counted in
    ``overflow`` (the reference has no such bound; its per-cell loops are
    data-dependent, collision_solver.wgsl:66-118, which XLA cannot express).

    home_only=True keeps just slot-0 (home) candidates — the layout the
    gather-only Jacobi solver wants, where each pair must be found once.
    """
    K = config.max_occupancy
    nslots = 1 if home_only else 4
    coords = cand.coords[:, :nslots]
    valid = cand.valid[:, :nslots]

    cell, in_range = linear_cell_ids(coords, valid, config)
    cell = cell.reshape(-1)
    cap4 = cell.shape[0]

    slot_idx = jnp.broadcast_to(
        jnp.arange(nslots, dtype=_I32)[None, :], valid.shape).reshape(-1)
    obj = jnp.repeat(jnp.arange(valid.shape[0], dtype=_I32), nslots)
    enc = obj * 4 + slot_idx
    live = in_range.reshape(-1)

    placed = ~live
    rows = []
    for _ in range(K):
        proposal = jnp.where(placed, BUCKET_EMPTY, enc)
        row = jnp.full(config.num_cells + 1, BUCKET_EMPTY, _I32)
        row = row.at[cell].min(proposal, mode="drop")
        won = (row[cell] == proposal) & ~placed
        placed = placed | won
        rows.append(row[:-1])
    entries = jnp.stack(rows, axis=-1)  # [num_cells, K]
    overflow = jnp.sum((~placed).astype(_I32))
    return Buckets(entries=entries, overflow=overflow)
