"""Morton code unit tests (vs the bit-by-bit golden model)."""

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu.ops import morton
import reference_model as ref
import pytest

pytestmark = pytest.mark.quick


def test_golden_values():
    # (3, 3) -> 15, documented example in grid.wgsl:111
    assert int(morton.morton_encode(jnp.uint32(3), jnp.uint32(3))) == 15
    # 5 -> unsplit 3, documented example in collision_solver.wgsl:122
    assert int(morton.unsplit_by_bits(jnp.uint32(5))) == 3
    assert int(morton.split_by_bits(jnp.uint32(3))) == 5


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    cx = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    cy = rng.integers(0, 1 << 16, 1000).astype(np.uint32)
    code = morton.morton_encode(jnp.asarray(cx), jnp.asarray(cy))
    dx, dy = morton.morton_decode(code)
    np.testing.assert_array_equal(np.asarray(dx), cx)
    np.testing.assert_array_equal(np.asarray(dy), cy)


def test_matches_golden_model():
    rng = np.random.default_rng(1)
    cx = rng.integers(0, 1 << 16, 200)
    cy = rng.integers(0, 1 << 16, 200)
    got = np.asarray(morton.morton_encode(jnp.asarray(cx, dtype=jnp.uint32),
                                          jnp.asarray(cy, dtype=jnp.uint32)))
    want = np.array([ref.morton_encode(int(a), int(b)) for a, b in zip(cx, cy)],
                    dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_z_order_locality():
    # Morton codes of a 2x2 block are contiguous when block-aligned.
    codes = [int(morton.morton_encode(jnp.uint32(x), jnp.uint32(y)))
             for y in (0, 1) for x in (0, 1)]
    assert sorted(codes) == [0, 1, 2, 3]
