"""Stable key/value sorting.

TPU-native replacement for the reference's GPU LSD radix sort
(src/utils/radix_sort/radix_sort.rs:26-40, radix_sort.wgsl:22-184): 8-bit
digits, 256-bin workgroup histograms, stable scatter.  None of that structure
survives here — TPUs expose no global atomics and XLA wants whole-array ops —
so the contract is just "stable ascending sort of uint32 keys with payloads":

  * ``sort_pairs``: ``jax.lax.sort`` with ``is_stable=True``.  XLA's TPU sort
    is the correctness baseline (BASELINE.json's north star explicitly allows
    it as the fallback).
  * ``argsort_u32``: stable permutation for the Morton resort.

A Pallas blockwise counting/radix sort (MXU one-hot ranking + histogram scan
+ unique-index scatter) is the planned perf upgrade behind this same
signature; the dense-bucket broad phase (ops/grid.py) avoids the global sort
altogether, which is the real TPU answer.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sort_pairs", "argsort_u32"]


def sort_pairs(keys: jax.Array, *payloads: jax.Array,
               impl: str = "lax") -> Tuple[jax.Array, ...]:
    """Stable ascending sort of uint32 ``keys``; payloads follow their key.

    Stability matters for parity: the reference radix sort is stable
    (radix_sort.wgsl:132-184 computes in-workgroup stable ranks), so equal
    cell ids keep their generation order (ascending object id).

    impl: "lax" -> jax.lax.sort; "radix" -> the Pallas blockwise radix sort
    (ops/radix_sort.py).  Both are stable and bit-identical in output.
    """
    assert keys.dtype == jnp.uint32
    if impl == "radix" and len(payloads) == 1:
        from gpu_physics_engine_tpu.ops.radix_sort import radix_sort_pairs
        return radix_sort_pairs(keys, payloads[0])
    out = jax.lax.sort((keys, *payloads), num_keys=1, is_stable=True)
    return out if isinstance(out, tuple) else (out,)


def argsort_u32(keys: jax.Array, impl: str = "lax") -> Tuple[jax.Array, jax.Array]:
    """(sorted_keys, permutation) for uint32 keys, stable."""
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sk, perm = sort_pairs(keys, iota, impl=impl)
    return sk, perm
