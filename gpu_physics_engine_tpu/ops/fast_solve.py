"""Gather-free collision solve: the TPU speed-of-light path.

Motivation (measured on TPU v5e, see DESIGN.md §6): XLA TPU gathers and
scatters run at ~1 GB/s effective regardless of index locality, while
`lax.sort` moves a key plus payloads at 5-25 GB/s.  The colored
Gauss-Seidel solver (ops/collision.py) performs ~100 gathers/scatters per
step; this module reformulates the narrow phase so the only data-movement
primitives are sorts and windowed shifts (contiguous reads XLA fuses):

  1. candidate entries (cell, idx, x, y, r) — positions ride as payloads;
     phantom cells use FIXED slots: a circle with r < cell/2 can only
     overlap the 3 neighbors on its nearest-corner side (sign of the
     in-cell offset), so no compaction pass is needed
  2. ONE unstable sort by cell id: occupants of a cell become adjacent AND
     carry their own positions — no gather to read neighbors
  3. pair sweep by window offset d = 1..K-1: entries (p, p+d) in the same
     run are a colliding pair; both sides' corrections accumulate through
     shifted elementwise ops (Jacobi within the pass)
  4. per-particle aggregation: ONE sort keyed by the original entry index
     (applying the inverse permutation as a sort — no scatter), then a
     [N, 4] reshape-sum over each particle's 4 slots

Semantics vs the reference solver (collision_solver.wgsl:66-118): pair
discovery and the per-pair positional correction (incl. per-shared-cell
duplicates) are identical, but all corrections of a pass apply
simultaneously (Jacobi) instead of sequentially within a cell
(Gauss-Seidel), and pair separation within a run is bounded by K-1 instead
of run occupancy by K.  Use `SimConfig.solver="colored"` when bit-parity
with the reference schedule matters; `"fast"` for production throughput.
Overflow (runs longer than the K window) is counted, never silent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gpu_physics_engine_tpu.core.config import SimConfig, UNUSED_CELL_ID
from gpu_physics_engine_tpu.ops import morton
from gpu_physics_engine_tpu.ops.grid import home_cells, _circle_in_cell

_I32 = jnp.int32
_U32 = jnp.uint32
MIN_DISTANCE = 1e-4  # collision_solver.wgsl:95


def build_candidate_entries(x, y, radius, active, cell_size):
    """Flat [4N] candidate entries (cell, idx, x, y, r), fixed slots.

    Slot 0 is the home cell (grid.wgsl:58-63).  Slots 1-3 are the only
    three neighbors a circle with r <= cell_size/2.2 can overlap — the ones
    toward its nearest corner: (sx, 0), (0, sy), (sx, sy) where sx/sy is
    the sign of the in-cell offset from the cell center.  Equivalent hit
    set to the reference's 8-neighbor scan (grid.wgsl:66-88); slot order
    differs but a sort by cell id follows, and each (cell, obj) pair is
    unique, so occupant sets are identical.
    """
    n = x.shape[0]
    sq_r = radius * radius
    hx, hy = home_cells(x, y, cell_size)

    frac_x = x - (hx.astype(jnp.float32) + 0.5) * cell_size
    frac_y = y - (hy.astype(jnp.float32) + 0.5) * cell_size
    sx = jnp.where(frac_x >= 0, _I32(1), _I32(-1))
    sy = jnp.where(frac_y >= 0, _I32(1), _I32(-1))

    home = jnp.where(active, morton.morton_encode(hx, hy),
                     _U32(UNUSED_CELL_ID))
    cells = [home]
    for ox, oy in ((1, 0), (0, 1), (1, 1)):
        ncx = hx + sx * ox
        ncy = hy + sy * oy
        hit = _circle_in_cell(x, y, sq_r, ncx, ncy, cell_size) & active
        cells.append(jnp.where(hit, morton.morton_encode(ncx, ncy),
                               _U32(UNUSED_CELL_ID)))

    # slot-major [4N] = concat(slot0, slot1, slot2, slot3): contiguous
    # copies, no strided interleave (the sort is unstable, input order is
    # free; the aggregation reshape is [4, N] accordingly)
    cells4 = jnp.concatenate(cells)
    idx4 = jnp.arange(4 * n, dtype=_U32)

    def rep(a):
        return jnp.concatenate([a, a, a, a])

    return cells4, idx4, rep(x), rep(y), rep(radius)


def _shift_up(a, d, fill):
    """a[p + d] with `fill` past the end (contiguous slice, no gather)."""
    return jnp.concatenate([a[d:], jnp.full((d,), fill, a.dtype)])


def _shift_down(a, d, fill):
    """a[p - d] with `fill` before the start."""
    return jnp.concatenate([jnp.full((d,), fill, a.dtype), a[:-d]])


def solve_fast(x, y, radius, active, cell_size, config: SimConfig
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One Jacobi collision relaxation. Returns (new_x, new_y, overflow)."""
    K = config.max_occupancy
    stiffness = jnp.float32(config.stiffness)
    n = x.shape[0]

    cells, idx, px, py, pr = build_candidate_entries(
        x, y, radius, active, cell_size)

    # --- one sort by cell id; positions ride along (no gathers later).
    # Unstable: pair corrections are summed, so equal-key order is free.
    cells_s, idx_s, xs, ys, rs = jax.lax.sort(
        (cells, idx, px, py, pr), num_keys=1, is_stable=False)
    valid = cells_s != _U32(UNUSED_CELL_ID)

    # --- pair sweep: window offsets d = 1..K-1 within equal-cell runs.
    # A pair can co-occupy several cells (home + phantoms); under Jacobi
    # summation applying it once per shared cell overshoots and oscillates
    # (the reference's sequential GS re-reads positions between duplicate
    # applications, so it tolerates them).  Canonical dedupe: apply the
    # pair only in the cell containing its CONTACT POINT
    # p = a + (b-a)*ra/(ra+rb), which lies strictly inside both circles and
    # is therefore always one of the shared cells. ---
    acc_x = jnp.zeros_like(xs)
    acc_y = jnp.zeros_like(ys)
    for d in range(1, K):
        same = (cells_s == _shift_up(cells_s, d, _U32(UNUSED_CELL_ID))) & valid
        xj = _shift_up(xs, d, jnp.float32(0))
        yj = _shift_up(ys, d, jnp.float32(0))
        rj = _shift_up(rs, d, jnp.float32(0))

        dx = xs - xj
        dy = ys - yj
        dist = jnp.sqrt(dx * dx + dy * dy)
        rsum = rs + rj
        hit = same & (rsum * rsum > dist * dist) & (dist > MIN_DISTANCE)

        # canonical-cell dedupe (see above)
        t_contact = rs / jnp.maximum(rsum, MIN_DISTANCE)
        cpx = xs - dx * t_contact
        cpy = ys - dy * t_contact
        ccx = jnp.floor(cpx / cell_size).astype(_I32)
        ccy = jnp.floor(cpy / cell_size).astype(_I32)
        hit = hit & (morton.morton_encode(ccx, ccy) == cells_s)
        safe = jnp.maximum(dist, MIN_DISTANCE)
        pen = (rsum - dist) * stiffness
        cxv = dx / safe * pen
        cyv = dy / safe * pen
        wi = rj / jnp.maximum(rsum, MIN_DISTANCE)
        wj = rs / jnp.maximum(rsum, MIN_DISTANCE)

        hitf = hit.astype(jnp.float32)
        acc_x = acc_x + cxv * wi * hitf
        acc_y = acc_y + cyv * wi * hitf
        # j side: subtract, shifted back onto the p+d entries
        acc_x = acc_x - _shift_down(cxv * wj * hitf, d, jnp.float32(0))
        acc_y = acc_y - _shift_down(cyv * wj * hitf, d, jnp.float32(0))

    # overflow: a run longer than the K window misses its distant pairs
    overK = (cells_s == _shift_up(cells_s, K, _U32(UNUSED_CELL_ID))) & valid
    overflow = jnp.sum(overK.astype(_I32))

    # --- aggregate per particle: sort by original entry index (inverse
    # permutation as a sort — scatters are ~5x slower) then fold the 4
    # slots of each particle with a reshape-sum. ---
    if config.fast_pack_bf16:
        # Corrections packed as 2 bf16 in one u32 payload: a measured ~35%
        # cut of this sort.  bf16's 8-bit mantissa on a *correction* (not a
        # position) bounds the error at ~0.4% of the overlap being resolved
        # — far below the solver's own stiffness under-relaxation; set
        # fast_pack_bf16=False (or solver="colored") for exact arithmetic.
        hi = jax.lax.bitcast_convert_type(
            acc_x.astype(jnp.bfloat16), jnp.uint16).astype(_U32)
        lo = jax.lax.bitcast_convert_type(
            acc_y.astype(jnp.bfloat16), jnp.uint16).astype(_U32)
        _, packed = jax.lax.sort((idx_s, (hi << 16) | lo), num_keys=1,
                                 is_stable=False)
        ax_o = jax.lax.bitcast_convert_type(
            (packed >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
        ay_o = jax.lax.bitcast_convert_type(
            (packed & _U32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32)
    else:
        _, ax_o, ay_o = jax.lax.sort((idx_s, acc_x, acc_y), num_keys=1,
                                     is_stable=False)
    dx_dense = ax_o.reshape(4, n).sum(axis=0)  # fold the 4 slot planes
    dy_dense = ay_o.reshape(4, n).sum(axis=0)

    return x + dx_dense, y + dy_dense, overflow
