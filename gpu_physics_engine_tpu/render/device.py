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
    """Exact reference ramp: blue -> pink -> yellow (wgsl:39-67)."""
    speed = jnp.sqrt(vx * vx + vy * vy)
    t = jnp.clip(speed / MAX_VELOCITY, 0.0, 1.0)
    s1 = _smoothstep(0.0, 0.5, t)
    s2 = _smoothstep(0.5, 1.0, t)
    low = jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t),
                     jnp.ones_like(t)], -1)
    mid = jnp.stack([jnp.ones_like(t), jnp.full_like(t, 0.5),
                     jnp.ones_like(t)], -1)
    high = jnp.stack([jnp.ones_like(t), jnp.ones_like(t),
                      jnp.zeros_like(t)], -1)
    c = low * (1.0 - s1[..., None]) + mid * s1[..., None]
    return c * (1.0 - s2[..., None]) + high * s2[..., None]


def _bilinear_weights(out_px: int, x0, x1, centers):
    """[out_px, n_src] bilinear weights: output pixel centers sampled over
    source sample centers (both in world units), rows normalized."""
    n = centers.shape[0]
    spacing = jnp.maximum(centers[1] - centers[0], 1e-6)
    ox = x0 + (jnp.arange(out_px, dtype=jnp.float32) + 0.5) / out_px * (x1 - x0)
    d = jnp.abs(ox[:, None] - centers[None, :]) / spacing
    w = jnp.maximum(0.0, 1.0 - d)
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-6)


@partial(jax.jit, static_argnames=("config", "width", "height"))
def _render_core(x, y, px, py, radius, pid, rect, config: SimConfig,
                 width: int, height: int):
    t, TY, TX = tile_geometry(config)
    tf = jnp.float32(t)

    # --- 1. composite: per-tile brightest-wins soft dot ---
    ty = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    tx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    cx = (tx.astype(jnp.float32) - 0.5) * tf  # border offset: tile 1 spans [0, t)
    cy = (ty.astype(jnp.float32) - 0.5) * tf
    occ = pid >= 0
    dx = x - cx
    dy = y - cy
    r2 = jnp.maximum(4.0 * radius * radius, 1e-8)  # quad spans 2r (wgsl:30)
    alpha = 1.0 - _smoothstep(0.2304, 0.25, (dx * dx + dy * dy) / r2)
    alpha = jnp.where(occ, alpha, 0.0)
    # brightest slot wins the tile (deterministic: first max in slot order);
    # one-hot masked reductions instead of take_along_axis — gathers are
    # ~1 GB/s on TPU, reductions are bandwidth-speed
    best = jnp.argmax(alpha, axis=0)                      # [TY, TX]
    amax = jnp.max(alpha, axis=0)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == best[None])
    take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0)
    rgb = _velocity_rgb(take(x - px), take(y - py))       # [TY, TX, 3]
    tile_img = rgb * amax[..., None]                      # over black clear

    # --- 2. resample to the viewport (two MXU matmuls) ---
    x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
    col_centers = (jnp.arange(TX, dtype=jnp.float32) - 0.5) * tf
    row_centers = (jnp.arange(TY, dtype=jnp.float32) - 0.5) * tf
    wx = _bilinear_weights(width, x0, x1, col_centers)    # [W, TX]
    wy = _bilinear_weights(height, y0, y1, row_centers)   # [H, TY]
    out = jnp.einsum("yxc,wx->ywc", tile_img, wx)
    out = jnp.einsum("ywc,hy->hwc", out, wy)
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
