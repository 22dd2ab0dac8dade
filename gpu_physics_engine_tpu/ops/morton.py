"""2D Morton (Z-order) codes, vectorized for the VPU.

Replaces the reference's WGSL bit-interleave helpers:
  - split_by_bits / morton_encode (grid.wgsl:99-114, home_cell_ids.wgsl:38-51)
  - unsplit_by_bits / morton_decode (collision_solver.wgsl:120-136)

The magic-mask interleave is the canonical public-domain construction
(16-bit coords -> 32-bit code).  Everything operates on uint32 arrays so the
codes sort correctly as unsigned keys and the UNUSED sentinel 0xFFFFFFFF
sinks to the end of a sort, the same trick the reference relies on
(grid.wgsl:5, SURVEY.md §2 C12).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["morton_encode", "morton_decode", "split_by_bits", "unsplit_by_bits"]

_U = jnp.uint32


def split_by_bits(v):
    """Spread the lower 16 bits of each element to even bit positions."""
    x = jnp.asarray(v).astype(_U) & _U(0x0000FFFF)
    x = (x | (x << 8)) & _U(0x00FF00FF)
    x = (x | (x << 4)) & _U(0x0F0F0F0F)
    x = (x | (x << 2)) & _U(0x33333333)
    x = (x | (x << 1)) & _U(0x55555555)
    return x


def unsplit_by_bits(v):
    """Inverse of split_by_bits: compact even bit positions to the low 16."""
    x = jnp.asarray(v).astype(_U) & _U(0x55555555)
    x = (x | (x >> 1)) & _U(0x33333333)
    x = (x | (x >> 2)) & _U(0x0F0F0F0F)
    x = (x | (x >> 4)) & _U(0x00FF00FF)
    x = (x | (x >> 8)) & _U(0x0000FFFF)
    return x


def morton_encode(cx, cy):
    """uint32 Z-order code from integer cell coords (each < 2^16)."""
    return split_by_bits(cx) | (split_by_bits(cy) << 1)


def morton_decode(code):
    """(cx, cy) uint32 cell coords from a Z-order code."""
    c = jnp.asarray(code).astype(_U)
    return unsplit_by_bits(c), unsplit_by_bits(c >> 1)
