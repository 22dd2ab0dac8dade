"""Independent numpy golden model of the engine's per-step pipeline.

The reference's tests recompute every expectation on the CPU next to the
assertions (e.g. tests/grid.rs:74-101 re-implements Morton + grid logic);
this module plays that role for the whole pipeline.  It is written with
scalar loops and python ints — deliberately nothing like the vectorized
JAX implementation — so agreement is meaningful.

Semantics mirrored (reference file:line):
  - home cell = floor(pos / cell_size), morton encoded   (grid.wgsl:52-61)
  - phantom cells by strict circle-vs-AABB, scan order y=-1..1, x=-1..1,
    compacted to slots 1..3, UNUSED padding                (grid.wgsl:66-94)
  - stable sort of (cell, obj) pairs                      (grid.rs:310-312)
  - collision cells = run starts with >= 2 occupants      (collision_cell_builder.wgsl)
  - 4-color Gauss-Seidel pair sweep, ascending (i, j),
    in-place positions, colors 1..4 in order              (collision_solver.wgsl:26-118)
  - Verlet + boundary clamp                               (particle_integration.wgsl:24-77)
"""

import numpy as np

UNUSED = 0xFFFFFFFF
F = np.float32


def morton_encode(cx: int, cy: int) -> int:
    """Bit-by-bit interleave (independent of the magic-mask version)."""
    code = 0
    for b in range(16):
        code |= ((cx >> b) & 1) << (2 * b)
        code |= ((cy >> b) & 1) << (2 * b + 1)
    return code


def morton_decode(code: int):
    cx = cy = 0
    for b in range(16):
        cx |= ((code >> (2 * b)) & 1) << b
        cy |= ((code >> (2 * b + 1)) & 1) << b
    return cx, cy


def home_cell(pos, cell_size):
    return (int(np.floor(pos[0] / cell_size)), int(np.floor(pos[1] / cell_size)))


def circle_in_cell(pos, sq_radius, cell, cell_size) -> bool:
    lo = np.array(cell, dtype=F) * F(cell_size)
    hi = lo + F(cell_size)
    closest = np.clip(np.asarray(pos, dtype=F), lo, hi)
    d = np.asarray(pos, dtype=F) - closest
    return float(d @ d) < float(sq_radius)


def build_cell_ids(positions, radii, cell_size):
    """4N cell_ids (uint32, UNUSED padded) + object_ids, reference layout."""
    n = len(positions)
    cell_ids = np.full(4 * n, UNUSED, dtype=np.uint64)
    object_ids = np.zeros(4 * n, dtype=np.int64)
    for i in range(n):
        base = 4 * i
        h = home_cell(positions[i], cell_size)
        cell_ids[base] = morton_encode(*h)
        object_ids[base] = i
        slot = 0
        sq_r = F(radii[i]) * F(radii[i])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nb = (h[0] + dx, h[1] + dy)
                if circle_in_cell(positions[i], sq_r, nb, cell_size):
                    slot += 1
                    if slot <= 3:
                        cell_ids[base + slot] = morton_encode(*nb)
                        object_ids[base + slot] = i
    return cell_ids, object_ids


def sort_map(cell_ids, object_ids):
    order = np.argsort(cell_ids, kind="stable")
    return cell_ids[order], object_ids[order]


def collision_cells(sorted_cells):
    """Ordered start indices of runs with >= 2 occupants."""
    out = []
    n = len(sorted_cells)
    for i in range(n):
        c = sorted_cells[i]
        if c == UNUSED:
            continue
        if i > 0 and sorted_cells[i - 1] == c:
            continue
        if i + 1 < n and sorted_cells[i + 1] == c:
            out.append(i)
    return out


def cell_color(code: int) -> int:
    cx, cy = morton_decode(code)
    return 1 + (cx % 2) + (cy % 2) * 2


def solve_colored(positions, radii, sorted_cells, sorted_objs,
                  stiffness=0.6, max_occupancy=None):
    """In-place 4-color Gauss-Seidel positional solve. Returns new positions."""
    pos = np.array(positions, dtype=F)
    radii = np.asarray(radii, dtype=F)
    starts = collision_cells(sorted_cells)
    n = len(sorted_cells)
    for color in (1, 2, 3, 4):
        for s in starts:
            code = sorted_cells[s]
            if cell_color(int(code)) != color:
                continue
            # occupants of this run (ascending object id by stable sort)
            occ = []
            j = s
            while j < n and sorted_cells[j] == code:
                occ.append(int(sorted_objs[j]))
                j += 1
            if max_occupancy is not None:
                occ = occ[:max_occupancy]
            for a in range(len(occ)):
                for b in range(a + 1, len(occ)):
                    i1, i2 = occ[a], occ[b]
                    d = pos[i1] - pos[i2]
                    dist = F(np.sqrt(F(d[0] * d[0] + d[1] * d[1])))
                    rsum = F(radii[i1] + radii[i2])
                    if rsum * rsum > dist * dist and dist > F(1e-4):
                        pen = F(rsum - dist)
                        direction = d / dist
                        corr = direction * pen * F(stiffness)
                        w1 = F(radii[i2] / rsum)   # = inv_m1/(inv_m1+inv_m2)
                        w2 = F(radii[i1] / rsum)
                        pos[i1] = pos[i1] + corr * w1
                        pos[i2] = pos[i2] - corr * w2
    return pos


def verlet(pos, prev, radii, dt, world, gravity=(0.0, 0.0),
           mouse=None, mouse_strength=150.0):
    pos = np.asarray(pos, dtype=F)
    prev = np.asarray(prev, dtype=F)
    radii = np.asarray(radii, dtype=F)
    vel = pos - prev
    acc = np.tile(np.asarray(gravity, dtype=F), (len(pos), 1))
    if mouse is not None:
        d = np.asarray(mouse, dtype=F) - pos
        norm = np.sqrt((d * d).sum(-1, keepdims=True))
        acc = acc + np.where(norm > 1e-6, d / np.maximum(norm, F(1e-6)), 0.0) \
            * F(mouse_strength)
    new = pos + vel + acc * F(dt) * F(dt)
    r = radii[:, None]
    lo = np.concatenate([r, r], axis=1)
    hi = np.asarray(world, dtype=F)[None, :] - lo
    new = np.clip(new, lo, hi)
    return new, pos
