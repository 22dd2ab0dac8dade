"""Sort + prefix-sum component tests, mirroring the reference's
tests/radix_sort.rs and tests/prefix_sum.rs cases."""

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu.ops.sort import sort_pairs, argsort_u32
from gpu_physics_engine_tpu.ops.scan import inclusive_scan, exclusive_scan
import pytest

pytestmark = pytest.mark.quick


def test_sort_reverse_ramp():
    # tests/radix_sort.rs:7-48 sorts 25_006 reverse-ordered keys.
    n = 25_006
    keys = jnp.arange(n - 1, -1, -1, dtype=jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.int32)
    sk, sv = sort_pairs(keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.arange(n, dtype=np.uint32))
    np.testing.assert_array_equal(np.asarray(sv), np.arange(n - 1, -1, -1))


def test_sort_is_stable():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 16, 10_000).astype(np.uint32)
    vals = np.arange(10_000, dtype=np.int32)
    sk, sv = sort_pairs(jnp.asarray(keys), jnp.asarray(vals))
    sk, sv = np.asarray(sk), np.asarray(sv)
    np.testing.assert_array_equal(sk, np.sort(keys))
    for k in range(16):
        seg = sv[sk == k]
        assert (np.diff(seg) > 0).all()  # payload order preserved within key


def test_sort_sentinel_sinks_last():
    keys = jnp.asarray([5, 0xFFFFFFFF, 1, 0xFFFFFFFF, 0], dtype=jnp.uint32)
    sk, = sort_pairs(keys)
    np.testing.assert_array_equal(
        np.asarray(sk), np.array([0, 1, 5, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32))


def test_argsort_permutation():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 31, 4096).astype(np.uint32)
    sk, perm = argsort_u32(jnp.asarray(keys))
    np.testing.assert_array_equal(np.asarray(sk), keys[np.asarray(perm)])


def test_scan_descending_ramp():
    # tests/prefix_sum.rs uses a descending ramp of 81_920 (forces the
    # reference's recursion; here just a size check against numpy).
    x = jnp.arange(81_920, 0, -1, dtype=jnp.uint32)
    got = np.asarray(inclusive_scan(x))
    want = np.cumsum(np.asarray(x), dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_scan_ones_and_zeros():
    ones = jnp.ones(1000, jnp.int32)
    np.testing.assert_array_equal(np.asarray(inclusive_scan(ones)),
                                  np.arange(1, 1001))
    zeros = jnp.zeros(1000, jnp.int32)
    assert np.asarray(inclusive_scan(zeros)).sum() == 0


def test_scan_large_random():
    # tests/prefix_sum.rs stresses 10.38M-14.38M elements; 2M keeps CPU CI fast.
    rng = np.random.default_rng(2)
    x = rng.integers(0, 8, 2_000_000).astype(np.uint32)
    got = np.asarray(inclusive_scan(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, dtype=np.uint32))


def test_exclusive_scan():
    x = jnp.asarray([3, 1, 4, 1, 5], jnp.int32)
    np.testing.assert_array_equal(np.asarray(exclusive_scan(x)),
                                  np.array([0, 3, 4, 8, 9]))
