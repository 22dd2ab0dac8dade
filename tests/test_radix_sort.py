"""Pallas radix sort tests (interpret mode on CPU), mirroring the
reference's tests/radix_sort.rs cases plus bit-parity vs lax.sort."""

import numpy as np
import jax.numpy as jnp

from gpu_physics_engine_tpu.ops.radix_sort import radix_sort_pairs
from gpu_physics_engine_tpu.ops.sort import sort_pairs


def test_reverse_ramp_25006():
    # tests/radix_sort.rs:7-48: 25_006 reverse-ordered keys (off-block size)
    n = 25_006
    keys = jnp.arange(n - 1, -1, -1, dtype=jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.int32)
    sk, sv = radix_sort_pairs(keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.arange(n, dtype=np.uint32))
    np.testing.assert_array_equal(np.asarray(sv), np.arange(n - 1, -1, -1))


def test_random_matches_lax():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2 ** 32, 10_000, dtype=np.uint32)
    vals = np.arange(10_000, dtype=np.int32)
    rk, rv = radix_sort_pairs(jnp.asarray(keys), jnp.asarray(vals))
    lk, lv = sort_pairs(jnp.asarray(keys), jnp.asarray(vals), impl="lax")
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(lk))
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(lv))


def test_stability_with_duplicates():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 4, 5_000, dtype=np.uint32)
    vals = np.arange(5_000, dtype=np.int32)
    _, sv = radix_sort_pairs(jnp.asarray(keys), jnp.asarray(vals), num_bits=8)
    np.testing.assert_array_equal(np.asarray(sv), np.argsort(keys, kind="stable"))


def test_unused_sentinel_sorts_last():
    keys = jnp.asarray([7, 0xFFFFFFFF, 3, 0xFFFFFFFF, 0], dtype=jnp.uint32)
    vals = jnp.arange(5, dtype=jnp.int32)
    sk, sv = radix_sort_pairs(keys, vals)
    np.testing.assert_array_equal(
        np.asarray(sk), [0, 3, 7, 0xFFFFFFFF, 0xFFFFFFFF])
    np.testing.assert_array_equal(np.asarray(sv)[3:], [1, 3])  # stable


def test_pipeline_with_radix_sort_matches_lax():
    """End-to-end: the whole step with sort_impl='radix' is trajectory-
    identical to 'lax' (both stable sorts)."""
    from gpu_physics_engine_tpu import Engine, SimConfig
    base = dict(max_particles=512, initial_particles=512,
                world_width=64.0, world_height=64.0,
                initial_radius=0.5, sort_interval_steps=5)
    a = Engine(SimConfig(**base, sort_impl="lax"), seed=3)
    b = Engine(SimConfig(**base, sort_impl="radix"), seed=3)
    sa = a.run(12)
    sb = b.run(12)
    np.testing.assert_array_equal(np.asarray(sa.x), np.asarray(sb.x))
    np.testing.assert_array_equal(np.asarray(sa.y), np.asarray(sb.y))
