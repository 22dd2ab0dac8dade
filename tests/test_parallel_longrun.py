"""Long-horizon sharded storage health (VERDICT r2 item 6).

The slab-scaled sweep budget (parallel/tiled_shard.py — the sharded
jam defense) landed in round 2 with only a 50-step dryrun.  This drives
a LOADED (~90% area fill) 8-device scene for 2 000+ steps — long enough
to include 8 full 240-step exact-sweep cycles — and asserts the
storage-jam signature (DESIGN.md §9: deferral events accelerating
without bound across windows) does not appear: the per-window deferral
stays bounded and non-accelerating, nobody is lost, and positions stay
finite.

Single long test on purpose: one compile, thousands of cheap steps.
"""

import numpy as np
import jax
import pytest

from gpu_physics_engine_tpu import SimConfig


@pytest.fixture(scope="module")
def mesh8():
    from gpu_physics_engine_tpu.parallel import mesh as mesh_lib
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return mesh_lib.make_mesh(8)


def test_sharded_loaded_long_horizon_no_jam(mesh8):
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)
    rng = np.random.default_rng(7)
    # ~90% area fill: the 4M-class density where the single-chip jam
    # bisect lived (DESIGN.md §9)
    W = H = 48.0
    n = int(0.9 * W * H / (np.pi * 0.25))
    pos = np.stack([rng.uniform(0.6, W - 0.6, n),
                    rng.uniform(0.6, H - 0.6, n)], -1).astype(np.float32)
    rad = np.full(n, 0.5, np.float32)
    cfg = SimConfig(max_particles=4096, initial_particles=n,
                    world_width=W, world_height=H, initial_radius=0.5,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                    migration_capacity=256, halo_capacity=256)
    eng = ShardedTiledEngine(cfg, mesh=mesh8,
                             initial_arrays=(pos, rad, None, None))

    windows = 4
    per_window = 520  # > two 240-step sweep cycles each
    deltas = []
    for _ in range(windows):
        of0 = int(np.asarray(eng.state.overflow_count).sum())
        eng.run(per_window)
        of1 = int(np.asarray(eng.state.overflow_count).sum())
        deltas.append(of1 - of0)

    # nobody lost, physics finite
    p = eng.positions()
    assert np.isfinite(p).all()
    assert len(p) == n

    # jam signature = accelerating deferral.  Healthy scenes settle:
    # the last window must not exceed the first settled window by more
    # than 2x (plus a small absolute allowance for sweep-phase noise).
    assert deltas[-1] <= 2 * max(deltas[1], 1) + n // 50, deltas
    # and the absolute deferral stays small: < 2% of particle-steps
    assert deltas[-1] / per_window / n < 0.02, deltas


def test_sharded_cross_topology_restore_with_spawn(mesh8):
    """Checkpoint on 8 chips, resume on 4, spawn, burn in: conservation
    holds across a topology change (moved here from __graft_entry__.
    dryrun_multichip in round 5 — the second full program set it
    compiles is what blew the driver's cold-compile budget; VERDICT r4
    next-round #1a)."""
    import os
    import tempfile
    from gpu_physics_engine_tpu.ops.tiled import export_particles
    from gpu_physics_engine_tpu.parallel import mesh as mesh_lib
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)

    n_dev = 8
    nd = 4 * n_dev
    spawn_n = 4
    cfg = SimConfig(
        max_particles=nd + spawn_n, initial_particles=nd,
        world_width=8.8, world_height=4.4 * n_dev, initial_radius=0.5,
        sort_interval_steps=0, pipeline="tiled", tile_cap=4,
        migration_capacity=64, halo_capacity=32,
        tiled_collide="jnp", gravity=(0.0, -60.0), tile_max_radius=1.0)
    eng = ShardedTiledEngine(cfg, mesh=mesh8, seed=0)
    eng.run(ShardedTiledEngine.CHUNK)
    eng.spawn_at((cfg.world_width / 2.0, cfg.world_height * 0.75),
                 count=spawn_n, verbose=False)
    n_total = nd + spawn_n
    assert eng.num_particles() == n_total

    with tempfile.TemporaryDirectory() as td:
        ck = os.path.join(td, "ck.npz")
        eng.save_checkpoint(ck)
        del eng
        eng2 = ShardedTiledEngine.from_checkpoint(
            ck, mesh=mesh_lib.make_mesh(4))
    assert eng2.num_particles() == n_total
    eng2.run(2 * ShardedTiledEngine.CHUNK)
    _, tp, _, _ = export_particles(eng2.state)
    assert np.isfinite(tp).all()
    assert tp.shape[0] == n_total, "cross-topology restore lost particles"


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
