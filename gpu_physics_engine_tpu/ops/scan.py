"""Prefix sums (inclusive/exclusive scans).

Replaces the reference's 3-pass hierarchical subgroup prefix sum
(src/utils/prefix_sum/prefix_sum.rs:10-151, prefix_sum.wgsl:13-147): per-block
subgroup scans, recursive block-sum scan, and an add-back pass.  On TPU the
whole construction is one XLA op — ``jax.lax.associative_scan`` (or cumsum)
lowers to a work-efficient parallel scan the compiler schedules across the
VPU — so this module is intentionally thin.  It exists as the named
counterpart of reference component C5 (SURVEY.md §2.1) and is what the
collision-cell compaction uses for offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["inclusive_scan", "exclusive_scan"]


def inclusive_scan(x: jax.Array, axis: int = 0) -> jax.Array:
    """Inclusive prefix sum, same contract as PrefixSum::execute (in place
    inclusive scan of a u32 buffer, prefix_sum.rs:142-168)."""
    return jax.lax.associative_scan(jnp.add, x, axis=axis)


def exclusive_scan(x: jax.Array, axis: int = 0) -> jax.Array:
    """Exclusive prefix sum (shift of the inclusive scan, identity first)."""
    inc = inclusive_scan(x, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(inc, 0, 1, axis=axis))
    shifted = jax.lax.slice_in_dim(inc, 0, x.shape[axis] - 1, axis=axis)
    return jax.lax.concatenate([zero, shifted], dimension=axis)
