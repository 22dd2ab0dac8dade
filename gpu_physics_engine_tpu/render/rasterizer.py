"""Point-splat rasterizer: particles -> soft-edged circles in a framebuffer.

Replaces the reference's instanced quad pipeline (R6, particle_drawer.rs:
one unit quad drawn num_particles times, vertex shader scales by radius*2,
fragment shader cuts a soft circle: alpha = 1 - smoothstep(0.2304, 0.25,
dist^2), particle_drawer.wgsl:69-81).  Two backends behind one function:

  * native: C++ via ctypes (render/native/rasterizer.cpp), built on demand
    with g++ — draw-order alpha blending, the real path.
  * numpy: vectorized fallback (used if the toolchain is unavailable);
    blends with saturating accumulation, visually close but not
    order-exact.  Never silently slower-on-big-scenes: the native build is
    attempted first and a warning names the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librasterizer.so")
_lib = None
_lib_failed = False


def _load_native():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        # always run make: its own mtime check makes this a no-op when
        # fresh, and it rebuilds when rasterizer.cpp changed (a stale
        # prebuilt .so would silently diverge — same hazard ADVICE.md
        # flagged for ops/tiled.py's tiler build)
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR], check=True,
            capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.splat_particles.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, f32p,
            ctypes.c_int64]
        lib.splat_particles.restype = None
        lib.draw_lines.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p, u8p,
            ctypes.c_int64]
        lib.draw_lines.restype = None
        _lib = lib
    except Exception as e:  # toolchain missing: fall back, loudly once
        warnings.warn(f"native rasterizer unavailable ({e}); using numpy fallback")
        _lib_failed = True
    return _lib


def _smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def splat(frame: np.ndarray, sx, sy, sradius, rgb) -> np.ndarray:
    """Blend particles into `frame` (H, W, 3 float32, mutated + returned).

    sx, sy: pixel-space centers (y-down); sradius: pixel radius; rgb [N,3].
    """
    assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.float32
    h, w = frame.shape[:2]
    sx = np.ascontiguousarray(sx, np.float32)
    sy = np.ascontiguousarray(sy, np.float32)
    sradius = np.ascontiguousarray(sradius, np.float32)
    rgb = np.ascontiguousarray(rgb, np.float32)
    n = sx.shape[0]
    if n == 0:
        return frame

    lib = _load_native()
    if lib is not None:
        lib.splat_particles(frame, w, h, sx, sy, sradius, rgb, n)
        return frame

    # numpy fallback: per-particle patches via scatter-max accumulation
    pr = np.maximum(sradius, 1e-3)
    pmax = int(np.ceil(2 * (pr.max() + 1)))
    offs = np.arange(pmax) - pmax // 2
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    px = np.round(sx)[:, None, None] + ox[None]
    py = np.round(sy)[:, None, None] + oy[None]
    lx = (px + 0.5 - sx[:, None, None]) / (2 * pr[:, None, None])
    ly = (py + 0.5 - sy[:, None, None]) / (2 * pr[:, None, None])
    alpha = 1.0 - _smoothstep(0.2304, 0.25, lx * lx + ly * ly)
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (alpha > 0)
    idx = (py.astype(np.int64) * w + px.astype(np.int64))[inb]
    a = alpha[inb][:, None].astype(np.float32)
    c = np.broadcast_to(rgb[:, None, None, :], (*alpha.shape, 3))[inb]
    flat = frame.reshape(-1, 3)
    np.maximum.at(flat, idx, c * a)
    return frame


def draw_axis_lines(frame: np.ndarray, a, b, rgb, horizontal) -> np.ndarray:
    """Draw 1px axis-aligned lines (a -> b endpoints in pixel coords)."""
    h, w = frame.shape[:2]
    a = np.ascontiguousarray(a, np.float32).reshape(-1, 2)
    b = np.ascontiguousarray(b, np.float32).reshape(-1, 2)
    rgb = np.ascontiguousarray(rgb, np.float32).reshape(-1, 3)
    horizontal = np.ascontiguousarray(horizontal, np.uint8)
    n = a.shape[0]
    if n == 0:
        return frame
    lib = _load_native()
    if lib is not None:
        lib.draw_lines(frame, w, h, a, b, rgb, horizontal, n)
        return frame
    for i in range(n):
        if horizontal[i]:
            y = int(round(a[i, 1]))
            if 0 <= y < h:
                x0 = max(int(round(a[i, 0])), 0)
                x1 = min(int(round(b[i, 0])), w - 1)
                frame[y, x0:x1 + 1] = rgb[i]
        else:
            x = int(round(a[i, 0]))
            if 0 <= x < w:
                y0 = max(int(round(a[i, 1])), 0)
                y1 = min(int(round(b[i, 1])), h - 1)
                frame[y0:y1 + 1, x] = rgb[i]
    return frame
