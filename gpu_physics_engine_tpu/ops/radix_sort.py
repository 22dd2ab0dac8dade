"""Pallas TPU radix sort: stable LSD sort of bounded uint32 keys + payload.

The TPU-native successor of the reference's WGSL radix sort
(radix_sort.rs:26-40, radix_sort.wgsl:22-184).  The reference's shape —
workgroup histograms via shared-memory atomics, serial cross-workgroup
bucket scan, stable in-workgroup ranks via per-bucket bit flags — is wgpu
hardware-speak; the TPU formulation of the same LSD algorithm is:

  pass p (8-bit digit):
    1. blockwise kernel (Pallas, grid over key blocks, VMEM-resident):
       one-hot [B, 256] of the block's digits, log-step inclusive scan
       along the block axis -> stable in-block rank per key + block
       histogram.  The [B, 256] intermediate never touches HBM.
    2. global digit offsets (tiny XLA cumsums over [nblocks, 256]).
    3. scatter the permutation (unique indices) + gather keys/payload.

Keys must be < 2**num_bits (the broad phase's cell ids are bounded by the
grid size, so 3 passes cover them; `sort_pairs` remaps the UNUSED sentinel
into range).  Stability across passes gives the same equal-key order as
the reference's sort — ascending original index.

Runs compiled on TPU; everywhere else falls back to interpret mode (tests).

STATUS (settled round 2, DESIGN.md §9): RETIRED to cross-check duty.
Hardware-verified correct + stable but 330 ms @1M — every stage is
XLA-random-access-bound and the rank kernel's sublane-axis log-scan runs
at ~6% VPU efficiency.  `lax.sort` is the production sort; the real
production answer is the tiled pipeline, which needs no per-frame sort.
This module remains as an independent implementation for validating
`lax.sort`-based paths (tests/test_radix_sort.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024
BINS = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rank_hist_kernel(keys_ref, rank_ref, hist_ref, *, shift: int):
    """One block: stable in-block digit ranks + digit histogram."""
    keys = keys_ref[...]  # [BLOCK] uint32 viewed as [BLOCK // 128, 128]? kept 2D below
    digits = (keys >> shift) & jnp.uint32(BINS - 1)
    bins = jax.lax.broadcasted_iota(jnp.uint32, (BLOCK, BINS), 1)
    onehot = (digits.reshape(BLOCK, 1) == bins).astype(jnp.int32)

    # log-step inclusive scan along the block axis (10 shifted adds)
    pre = onehot
    offset = 1
    while offset < BLOCK:
        rolled = pltpu.roll(pre, shift=offset, axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BINS), 0)
        pre = pre + jnp.where(row >= offset, rolled, 0)
        offset *= 2

    # rank_i = (inclusive count of digit_i up to i) - 1, gathered via the
    # one-hot row (single masked row-sum, no lane gather needed)
    rank = jnp.sum(pre * onehot, axis=1) - 1
    rank_ref[...] = rank.reshape(rank_ref.shape)
    # hist block is (8, BINS) with only row 0 meaningful: Mosaic rejects
    # (1, BINS) blocks (sublane dim must be divisible by 8 or full) and a
    # flat (BINS,) block clashes with XLA's T(1024) layout for 1D arrays
    # (both learned on hardware); the caller slices rows [::8]
    hist_ref[...] = jnp.broadcast_to(pre[BLOCK - 1:BLOCK, :],
                                     hist_ref.shape)


@functools.partial(jax.jit, static_argnames=("shift",))
def _rank_hist(keys_padded: jax.Array, shift: int):
    n = keys_padded.shape[0]
    nblocks = n // BLOCK
    kernel = functools.partial(_rank_hist_kernel, shift=shift)
    rank, hist = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((BLOCK,), lambda b: (b,),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((BLOCK,), lambda b: (b,), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BINS), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((nblocks * 8, BINS), jnp.int32),
        ),
        interpret=_interpret(),
    )(keys_padded)
    return rank, hist[::8]


def _one_pass(keys, payload, shift: int):
    n = keys.shape[0]
    nblocks = n // BLOCK
    rank, hist = _rank_hist(keys, shift)

    # Global digit bases: exclusive scan in (digit, block) order — digits
    # major (all blocks of digit d precede digit d+1), blocks minor
    # (stability across blocks).
    flat = hist.T.reshape(-1)                       # [BINS * nblocks]
    excl = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(flat)[:-1]])
    offsets = excl.reshape(BINS, nblocks).T         # [nblocks, BINS]

    digits = ((keys >> shift) & jnp.uint32(BINS - 1)).astype(jnp.int32)
    block_id = jnp.arange(n, dtype=jnp.int32) // BLOCK
    # flat 1D gather: the 2-index form offsets[block_id, digits] lowers to
    # a far slower XLA gather (measured 100+ ms/pass at 1M on TPU)
    dest = jnp.take(offsets.reshape(-1),
                    block_id * BINS + digits) + rank

    # dest is a permutation of [0, n): scatter it once, gather data through
    # the inverse (gathers beat scatters on TPU).
    inv = jnp.zeros(n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return jnp.take(keys, inv), jnp.take(payload, inv)


def radix_sort_pairs(keys: jax.Array, payload: jax.Array,
                     num_bits: int = 32) -> Tuple[jax.Array, jax.Array]:
    """Stable ascending sort by uint32 keys (< 2**num_bits); one payload.

    Pads to a BLOCK multiple with 0xFFFFFFFF sentinels (sorted last — only
    valid when num_bits == 32 or all keys < 2**num_bits, which also maps
    the engine's UNUSED_CELL_ID correctly when num_bits covers it)."""
    assert keys.dtype == jnp.uint32
    n = keys.shape[0]
    padded = ((n + BLOCK - 1) // BLOCK) * BLOCK
    pad = padded - n
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, 0xFFFFFFFF, jnp.uint32)])
        payload = jnp.concatenate([payload, jnp.zeros(pad, payload.dtype)])

    passes = (num_bits + 7) // 8
    for p in range(passes):
        keys, payload = _one_pass(keys, payload, shift=8 * p)
    return keys[:n], payload[:n]
