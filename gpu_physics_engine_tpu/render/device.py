"""Device-side particle rendering for the tiled engine.

Replaces the host splatter (render/rasterizer.py, ~2 s/frame at 4M: it
downloads N x 4 arrays and rasterizes on one CPU core) with an on-chip
pipeline that downloads only the finished 1280x720 RGB frame — the TPU
analog of the reference's on-GPU instanced drawing
(src/particles/particle_drawer.wgsl:21-81).

TPU-first design: no scatter (XLA scatters run ~1 GB/s; Mosaic kernels
cannot dynamically index VMEM values).  Instead the persistent tile
storage [CAP, TY, TX] IS a coarse framebuffer:

  1. **Composite** — per tile, every slot's soft-circle alpha is sampled
     at the tile center (particle_drawer.wgsl:69-81: alpha =
     1 - smoothstep(0.2304, 0.25, d^2 / (2r)^2)) and its velocity color
     computed with the exact reference ramp (wgsl:39-67, replicated in
     render/colormap.py).  Slots reduce to one RGB per tile by
     brightest-wins max — order-independent and deterministic, the
     functional analog of draw-order blending over a black clear.
  2. **Resample** — the [TY, TX, 3] tile image is bilinearly resampled to
     the requested viewport with two small matmuls (weights built
     in-graph from the camera rectangle, so pan/zoom never recompiles).
     Matmuls ride the MXU; the whole frame costs ~1-2 ms on-device.
  3. **Download** — one [H, W, 3] u8 array (2.7 MB at 1280x720).

Positional quantization: a particle renders at its tile's center, i.e.
within +-t/2 world units of its true position (sub-pixel at the 4M
geometry where a tile is ~0.6 output pixels; coarser for small-N scenes
with big tiles — use the host splatter when exact positions matter).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry

MAX_VELOCITY = 0.3  # particle_drawer.wgsl:21


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _velocity_rgb(vx, vy):
    """Exact reference ramp: blue -> pink -> yellow (wgsl:39-67).

    Returns three SEPARATE planes (r, g, b), never a [..., 3] array: a
    size-3 minor axis wastes 125/128 of every vector register on TPU —
    carrying channels as planes is what took the 4M composite from
    ~80 ms to ~3 ms."""
    speed = jnp.sqrt(vx * vx + vy * vy)
    t = jnp.clip(speed / MAX_VELOCITY, 0.0, 1.0)
    s1 = _smoothstep(0.0, 0.5, t)
    s2 = _smoothstep(0.5, 1.0, t)
    # lerp(lerp(low, mid, s1), high, s2) per channel:
    # low = (0, 0, 1), mid = (1, 0.5, 1), high = (1, 1, 0)
    r = s1 * (1.0 - s2) + s2
    g = 0.5 * s1 * (1.0 - s2) + s2
    b = (1.0 - s2)
    return r, g, b


def _bilinear_weights(out_px: int, x0, x1, centers, normalize: bool = True,
                      spacing=None):
    """[out_px, n_src] bilinear weights: output pixel centers sampled over
    source sample centers (both in world units).  ``normalize=False``
    returns raw tent weights — callers summing several sample grids
    normalize once at the end (separable row-sum outer product).
    ``spacing`` overrides the tent width when ``centers`` is a strided
    subset of a finer grid (the parity renderer passes the FULL grid
    pitch so each center keeps the same tent it has in full space)."""
    n = centers.shape[0]
    if spacing is None:
        spacing = jnp.maximum(centers[1] - centers[0], 1e-6)
    ox = x0 + (jnp.arange(out_px, dtype=jnp.float32) + 0.5) / out_px * (x1 - x0)
    d = jnp.abs(ox[:, None] - centers[None, :]) / spacing
    w = jnp.maximum(0.0, 1.0 - d)
    if not normalize:
        return w
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-6)


@partial(jax.jit, static_argnames=("config", "width", "height"))
def _render_core(x, y, px, py, radius, pid, rect, config: SimConfig,
                 width: int, height: int):
    t, TY, TX = tile_geometry(config)
    tf = jnp.float32(t)
    S = config.render_supersample
    spacing = t / S

    # --- 1. composite: per-sample brightest-wins soft dot ---
    # Each tile is sampled at S x S points (render_supersample); a
    # particle's splat radius is clamped to cover its nearest sample
    # (0.75 x spacing >= the half-diagonal) — the point-sprite minimum:
    # a particle smaller than the sample cell still lights its sample,
    # exactly like the host rasterizer's 1-px-minimum splat.  At the 4M
    # production geometry (tile ~ output pixel) S=1 reproduces the
    # reference's look; S>1 recovers sub-tile positioning when zoomed.
    ty = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    tx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    occ = pid >= 0
    # effective quad span: 2r, or 1.5 x sample spacing if bigger
    span = jnp.maximum(2.0 * radius, jnp.float32(1.5 * spacing))
    r2 = jnp.maximum(span * span, 1e-8)  # quad spans 2r (wgsl:30)

    def sample_planes(i: int, j: int):
        """Brightest-wins composite at subsample (i, j) -> r/g/b planes."""
        cx = (tx.astype(jnp.float32) - 1.0 + (j + 0.5) / S) * tf
        cy = (ty.astype(jnp.float32) - 1.0 + (i + 0.5) / S) * tf
        dx = x - cx
        dy = y - cy
        alpha = 1.0 - _smoothstep(0.2304, 0.25, (dx * dx + dy * dy) / r2)
        alpha = jnp.where(occ, alpha, 0.0)
        # brightest slot wins (deterministic: first max in slot order);
        # one-hot masked reductions instead of take_along_axis — gathers
        # are ~1 GB/s on TPU, reductions are bandwidth-speed
        best = jnp.argmax(alpha, axis=0)                  # [TY, TX]
        amax = jnp.max(alpha, axis=0)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
                  == best[None])
        take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0)
        # channels stay as separate [TY, TX] planes throughout (see
        # _velocity_rgb: a [..., 3] layout wastes 125/128 of every vreg)
        return [c * amax for c in
                _velocity_rgb(take(x - px), take(y - py))]  # over black

    # --- 2. resample to the viewport (two MXU matmuls per plane) ---
    # plain 2D dots on [TY, TX] planes: an einsum carrying the channel
    # axis lowers to strided reductions that never tile onto the MXU
    # (measured ~80 ms/frame at 4M vs ~matmul speed here).  bf16
    # operands double MXU throughput; f32 accumulation keeps the 8-bit
    # output exact to the eye.  Sub-sample grids are never interleaved
    # into one fine image (strided relayouts are gather-class on TPU):
    # resampling is linear, so each subsample's plane is resampled with
    # its own weight rows and SUMMED, with one separable normalization
    # (row-sum outer product) at the end — identical to normalized
    # bilinear interpolation over the union of all S^2 sample grids.
    x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
    bf = jnp.bfloat16
    acc = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
    ny = jnp.zeros((height,), jnp.float32)
    nx = jnp.zeros((width,), jnp.float32)
    base = jnp.arange(TX, dtype=jnp.float32)
    basey = jnp.arange(TY, dtype=jnp.float32)
    for i in range(S):
        row_centers = (basey - 1.0 + (i + 0.5) / S) * tf
        wy = _bilinear_weights(height, y0, y1, row_centers, normalize=False)
        ny = ny + wy.sum(axis=1)
        wyb = wy.astype(bf)
        for j in range(S):
            col_centers = (base - 1.0 + (j + 0.5) / S) * tf
            wx = _bilinear_weights(width, x0, x1, col_centers,
                                   normalize=False)
            if i == 0:
                nx = nx + wx.sum(axis=1)
            wxT = wx.T.astype(bf)
            for c, p in enumerate(sample_planes(i, j)):
                o = jax.lax.dot(p.astype(bf), wxT,
                                preferred_element_type=jnp.float32)
                acc[c] = acc[c] + jax.lax.dot(
                    wy.astype(bf), o.astype(bf),
                    preferred_element_type=jnp.float32)

    norm = jnp.maximum(ny[:, None] * nx[None, :], 1e-6)
    out = jnp.stack([a / norm for a in acc], axis=-1)     # [H, W, 3]
    out = out[::-1]  # world y-up -> image y-down
    return (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def autofit_rect(config: SimConfig, width: int, height: int,
                 fill: float = 0.9) -> Tuple[float, float, float, float]:
    """World rectangle that fits the whole world at ``fill`` coverage,
    aspect-corrected — the reference camera's auto-fit (camera.rs:30-42)."""
    ww, wh = config.world_width, config.world_height
    zoom = fill * min(width / ww, height / wh)
    vw, vh = width / zoom, height / zoom
    cx, cy = ww / 2.0, wh / 2.0
    return (cx - vw / 2.0, cy - vh / 2.0, cx + vw / 2.0, cy + vh / 2.0)


@partial(jax.jit, static_argnames=("config", "width", "height"))
def _render_window(x, y, px, py, radius, pid, rects, config: SimConfig,
                   width: int, height: int):
    """``len(rects)`` frames scanned inside ONE program -> u8 checksum.

    The honest device-side frame-cost measurement on tunneled runtimes
    (DESIGN.md §6): timing per-dispatch frames measures the tunnel
    (~5-10 ms/program + ~43 ms per 2.7 MB download), not the chip —
    measured 97 ms/frame dispatched vs 1.9 ms/frame scanned at the 4M
    geometry.  Same methodology as the sim's scanned step windows."""
    def body(c, rect):
        # the rect[0]*0 dependency keeps the composite stage inside the
        # scan (XLA would hoist the loop-invariant stage out otherwise
        # and the window would time the resample alone)
        img = _render_core(x + rect[0] * 0.0, y, px, py, radius, pid,
                           rect, config, width, height)
        return c + img[0, 0, 0].astype(jnp.int32), None
    return jax.lax.scan(body, jnp.int32(0), rects)[0]


def render_throughput_ms(state: TileState, config: SimConfig,
                         frames: int = 16, width: int = 1280,
                         height: int = 720) -> float:
    """Median device-side ms/frame over a scanned ``frames``-deep window
    (fetch-synced; see _render_window for why dispatched-frame timing is
    not meaningful over the TPU tunnel)."""
    import time
    rect = np.asarray(autofit_rect(config, width, height), np.float32)
    rects = jnp.asarray(
        np.tile(rect, (frames, 1))
        + np.arange(frames, dtype=np.float32)[:, None] * 1e-3)
    args = (state.x, state.y, state.px, state.py, state.radius, state.pid)
    int(_render_window(*args, rects, config, width, height))  # compile
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = _render_window(*args, rects, config, width, height)
        int(c)  # fetch = device sync
        best.append((time.perf_counter() - t0) / frames * 1e3)
    return sorted(best)[1]


def render_parity_core(subs, rect, config: SimConfig, width: int,
                       height: int, TY: int, TX: int):
    """_render_core for PARITY-SPACE GS state (ops/gs_parity.to_parity
    layout: ``subs[field][(pa, pb)][c, si, sj] = full[c, 2*si+pa,
    2*sj+pb]``) — lets render_run fuse the device render into the
    parity-GS frame loop WITHOUT recomposing to full space per frame
    (the per-step mx relayout tax is what the parity layout exists to
    avoid, ops/gs_parity.py module docstring).

    Identical math to _render_core: the brightest-wins composite is
    per-tile (tiles are disjoint across parities, so compositing each
    parity's sub-grid is exact), and the resample already sums several
    sample grids with one separable normalization — the four parity
    grids just join the subsample grids in that union, each keeping the
    full-grid tent width.  Parity pad tiles (beyond TY/TX) carry
    pid = -1 (black) and their resample weights are masked so the
    normalization matches full space.  Float accumulation ORDER differs
    from _render_core, so outputs agree to f32 rounding (~1e-6), not
    bitwise."""
    t, _, _ = tile_geometry(config)
    tf = jnp.float32(t)
    S = config.render_supersample
    spacing = t / S
    x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
    bf = jnp.bfloat16
    r0 = jnp.float32(config.initial_radius)

    def sample_planes(pa: int, pb: int, i: int, j: int):
        f = {n: subs[n][(pa, pb)] for n in subs}
        x, y, pid = f["x"], f["y"], f["pid"]
        radius = f["r"] if "r" in f else jnp.where(pid >= 0, r0, 0.0)
        occ = pid >= 0
        si = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        sj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        cy = ((2 * si + pa).astype(jnp.float32)
              - 1.0 + (i + 0.5) / S) * tf
        cx = ((2 * sj + pb).astype(jnp.float32)
              - 1.0 + (j + 0.5) / S) * tf
        span = jnp.maximum(2.0 * radius, jnp.float32(1.5 * spacing))
        r2 = jnp.maximum(span * span, 1e-8)
        dx = x - cx
        dy = y - cy
        alpha = 1.0 - _smoothstep(0.2304, 0.25, (dx * dx + dy * dy) / r2)
        alpha = jnp.where(occ, alpha, 0.0)
        best = jnp.argmax(alpha, axis=0)
        amax = jnp.max(alpha, axis=0)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
                  == best[None])
        take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0)
        return [c * amax for c in
                _velocity_rgb(take(x - f["px"]), take(y - f["py"]))]

    acc = [jnp.zeros((height, width), jnp.float32) for _ in range(3)]
    ny = jnp.zeros((height,), jnp.float32)
    nx = jnp.zeros((width,), jnp.float32)
    shapes = subs["pid"]
    for pa in (0, 1):
        SY = shapes[(pa, 0)].shape[1]
        basey = 2.0 * jnp.arange(SY, dtype=jnp.float32) + pa
        rowvalid = (basey < TY).astype(jnp.float32)
        for i in range(S):
            row_centers = (basey - 1.0 + (i + 0.5) / S) * tf
            wy = _bilinear_weights(height, y0, y1, row_centers,
                                   normalize=False, spacing=tf)
            wy = wy * rowvalid[None, :]
            ny = ny + wy.sum(axis=1)     # once per (row parity, i)
            wyb = wy.astype(bf)
            for pb in (0, 1):
                SX = shapes[(pa, pb)].shape[2]
                basex = 2.0 * jnp.arange(SX, dtype=jnp.float32) + pb
                colvalid = (basex < TX).astype(jnp.float32)
                for j in range(S):
                    col_centers = (basex - 1.0 + (j + 0.5) / S) * tf
                    wx = _bilinear_weights(width, x0, x1, col_centers,
                                           normalize=False, spacing=tf)
                    wx = wx * colvalid[None, :]
                    if pa == 0 and i == 0:
                        nx = nx + wx.sum(axis=1)  # once per (col parity, j)
                    wxT = wx.T.astype(bf)
                    for c, p in enumerate(sample_planes(pa, pb, i, j)):
                        o = jax.lax.dot(p.astype(bf), wxT,
                                        preferred_element_type=jnp.float32)
                        acc[c] = acc[c] + jax.lax.dot(
                            wyb, o.astype(bf),
                            preferred_element_type=jnp.float32)
    norm = jnp.maximum(ny[:, None] * nx[None, :], 1e-6)
    out = jnp.stack([a / norm for a in acc], axis=-1)     # [H, W, 3]
    out = out[::-1]  # world y-up -> image y-down
    return (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def render_tiles_device(state: TileState, config: SimConfig,
                        rect: Optional[Tuple[float, float, float, float]] = None,
                        width: int = 1280, height: int = 720) -> np.ndarray:
    """On-chip frame of a TileState -> host u8[height, width, 3].

    ``rect`` = (x0, y0, x1, y1) world window (default: 90% auto-fit).
    The camera window is a traced argument: pan/zoom never recompiles."""
    if rect is None:
        rect = autofit_rect(config, width, height)
    img = _render_core(state.x, state.y, state.px, state.py, state.radius,
                       state.pid, jnp.asarray(rect, jnp.float32),
                       config, width, height)
    return np.asarray(img)
