"""Sharded-GS prototype (parallel/gs_shard.py): bit-parity + structure.

PARITY.md's sharded-GS exclusion said a distributed exact-GS frame
needs a halo exchange per color pass; the round-4 verdict asked for
that to be measured, not just argued.  The prototype exists for that
measurement — these tests lock its correctness claim: the slab-
decomposed 4-color frame is BITWISE the single-chip gs_solve.
"""

import numpy as np
import jax
import pytest

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops.gs_tiled import gs_solve


def _cfg(**kw):
    kw.setdefault("max_particles", 512)
    kw.setdefault("initial_particles", 0)
    kw.setdefault("world_width", 24.0)
    kw.setdefault("world_height", 24.0)
    kw.setdefault("initial_radius", 0.5)
    kw.setdefault("pipeline", "tiled")
    kw.setdefault("tiled_solver", "gs")
    kw.setdefault("tile_multiplier", 2.2)
    kw.setdefault("tile_cap", 3)
    kw.setdefault("max_occupancy", 4)
    return SimConfig(**kw)


def _pid_sorted(st):
    pid = np.asarray(st.pid).ravel()
    live = pid >= 0
    order = np.argsort(pid[live])
    return (pid[live][order],
            np.asarray(st.x).ravel()[live][order],
            np.asarray(st.y).ravel()[live][order])


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_gs_bitwise_parity(n_shards):
    from gpu_physics_engine_tpu.parallel import mesh as mesh_lib
    from gpu_physics_engine_tpu.parallel.gs_shard import (
        make_sharded_gs_solve)
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        init_sharded_tiles)

    cfg = _cfg()
    rng = np.random.default_rng(17)
    n = 180  # dense enough for cross-boundary pairs in a 24x24 world
    pos = np.stack([rng.uniform(0.8, cfg.world_width - 0.8, n),
                    rng.uniform(0.8, cfg.world_height - 0.8, n)],
                   -1).astype(np.float32)
    rad = np.full(n, cfg.initial_radius, np.float32)

    st = tiled.init_tiles(cfg, pos, rad)
    ref = gs_solve(st, cfg)
    ref_pid, ref_x, ref_y = _pid_sorted(ref)

    mesh = mesh_lib.make_mesh(n_shards)
    sst = init_sharded_tiles(cfg, mesh, pos, rad)
    out = make_sharded_gs_solve(cfg, mesh)(sst)
    out_pid, out_x, out_y = _pid_sorted(out)

    np.testing.assert_array_equal(ref_pid, out_pid)
    # BITWISE: same f32 op order, ghost sweeps are redundant
    # recomputation of the identical cells
    np.testing.assert_array_equal(ref_x, out_x)
    np.testing.assert_array_equal(ref_y, out_y)
    assert int(out.overflow_count) == int(ref.overflow_count)


def test_bytes_per_frame_structure():
    from gpu_physics_engine_tpu.parallel.gs_shard import bytes_per_frame
    cfg = _cfg()
    bill = bytes_per_frame(cfg, 4)
    assert bill["exchanges_per_frame"] == 4
    # 5 frame-start planes + 3 x 2 refresh planes, 2 rows each way
    row_block = cfg.tile_cap * 2 * bill["tile_cols"] * 4
    assert bill["frame_start_bytes"] == 5 * row_block * 2
    assert bill["total_bytes_per_frame"] == (5 + 6) * row_block * 2


def test_too_thin_slabs_refused():
    from gpu_physics_engine_tpu.parallel import mesh as mesh_lib
    from gpu_physics_engine_tpu.parallel.gs_shard import (
        make_sharded_gs_solve)
    cfg = _cfg(world_height=8.0)  # ~7+2 tile rows over 8 shards
    with pytest.raises(AssertionError, match="ghost rows"):
        make_sharded_gs_solve(cfg, mesh_lib.make_mesh(8))


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
