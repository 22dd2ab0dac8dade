"""ops/tiled.rebuild_band: sectioned (row-band) storage rebuild.

The monolithic rebuild does not compile at the 4M-GS geometry (81-min
compile ERROR, docs/probes_r4/tpu_probe_gs_rebuild.jsonl); the band
rebuild re-slots one rows-band per program with a TRACED start row, so
one compilation serves every band position.  These lock the contract:
nobody lost, in-band stale goes to zero, out-of-band slots untouched,
demand overflow goes to band free slots, one program serves all
positions, the engine "bands" sweep hook drives it, and the lowered
program stays small at the true 4M-GS geometry.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.ops import tiled


def _cfg(**kw):
    kw.setdefault("max_particles", 256)
    kw.setdefault("initial_particles", 0)
    kw.setdefault("world_width", 24.0)
    kw.setdefault("world_height", 24.0)
    kw.setdefault("initial_radius", 0.5)
    kw.setdefault("pipeline", "tiled")
    kw.setdefault("tile_cap", 4)
    kw.setdefault("tile_multiplier", 3.3)
    return SimConfig(**kw)


def _grid_state(cfg, n=48, seed=3):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(1.0, cfg.world_width - 1.0, n),
                    rng.uniform(1.0, cfg.world_height - 1.0, n)],
                   -1).astype(np.float32)
    rad = np.full(n, cfg.initial_radius, np.float32)
    return tiled.init_tiles(cfg, pos, rad)


def _sorted_particles(st):
    pid = np.asarray(st.pid).ravel()
    live = pid >= 0
    order = np.argsort(pid[live])
    return (pid[live][order],
            np.asarray(st.x).ravel()[live][order],
            np.asarray(st.y).ravel()[live][order],
            np.asarray(st.radius).ravel()[live][order])


def _displaced(st, shift=(2, 2)):
    """Roll storage slots (positions stay) — the >= 2-tile stale class."""
    return dataclasses.replace(
        st, **{f: jnp.roll(getattr(st, f), shift, axis=(1, 2))
               for f in ("x", "y", "px", "py", "radius", "pid")})


def test_full_cover_band_drains_stale_to_zero():
    """One band covering the whole grid, iterated: every displaced
    particle drains home (chains resolve across passes as departures
    free dead slots), stale -> 0, conservation exact."""
    cfg = _cfg()
    st = _grid_state(cfg)
    _, TY, TX = tiled.tile_geometry(cfg)
    before = _sorted_particles(st)
    rb = _displaced(st)
    assert float(tiled.stale_pair_fraction(rb, cfg)) > 0.0
    for _ in range(4):
        rb = tiled.rebuild_band(rb, cfg, 0, rows=TY)
    assert float(tiled.stale_pair_fraction(rb, cfg)) == 0.0
    after = _sorted_particles(rb)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(rb.num_active) == int(st.num_active)
    assert int(rb.overflow_count) == int(st.overflow_count)


def test_band_only_touches_its_rows_and_conserves():
    """A band rebuild is local: slots outside [row0, row0+rows) are
    bit-identical; particles are conserved globally; stale pairs whose
    storage AND home lie inside the band are fixed."""
    cfg = _cfg()
    st = _grid_state(cfg, n=64, seed=9)
    _, TY, TX = tiled.tile_geometry(cfg)
    rolled = _displaced(st)
    before = _sorted_particles(rolled)
    row0, rows = 2, max(4, TY // 2)
    rb = tiled.rebuild_band(rolled, cfg, row0, rows=rows)
    # out-of-band rows untouched
    for f in ("x", "y", "px", "py", "radius", "pid"):
        a = np.asarray(getattr(rolled, f))
        b = np.asarray(getattr(rb, f))
        np.testing.assert_array_equal(a[:, :row0], b[:, :row0])
        np.testing.assert_array_equal(a[:, row0 + rows:], b[:, row0 + rows:])
    # conservation: same particle set, nobody lost
    after = _sorted_particles(rb)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(rb.num_active) == int(rolled.num_active)
    # drain semantics: after two passes every in-band-stored,
    # in-band-homed particle of this sparse scene is at home (demand
    # per tile is far under cap, so pass 1 drains everyone whose home
    # had a dead slot and pass 2 the chain tails)
    rb2 = tiled.rebuild_band(rb, cfg, row0, rows=rows)
    t, _, _ = tiled.tile_geometry(cfg)
    pid = np.asarray(rb2.pid)
    ys = np.asarray(rb2.y)
    xs = np.asarray(rb2.x)
    k, ty, tx = np.nonzero(pid >= 0)
    hty = np.clip((ys[k, ty, tx] // t).astype(int) + 1, 1, TY - 2)
    htx = np.clip((xs[k, ty, tx] // t).astype(int) + 1, 1, TX - 2)
    in_band_home = (hty >= row0) & (hty < row0 + rows)
    in_band_store = (ty >= row0) & (ty < row0 + rows)
    stuck = in_band_home & in_band_store & ((hty != ty) | (htx != tx))
    assert not stuck.any(), "drain left reachable stale in place"


def test_band_demand_over_cap_fills_home_and_leaves_rest_in_place():
    """5 particles' homes crammed into one cap-2 cell: the drain fills
    the home tile to cap and leaves the remaining claimants EXACTLY
    where they were (no loser scatter — the round-5 hardware probe
    showed arbitrary-free-slot spill at 103% fill triples the stale
    creep; docs/probes_r5/tpu_probe_gs_bands.jsonl)."""
    cfg = _cfg(tile_cap=2)
    st = _grid_state(cfg, n=24, seed=5)
    _, TY, TX = tiled.tile_geometry(cfg)
    x = np.asarray(st.x).copy()
    y = np.asarray(st.y).copy()
    pid = np.asarray(st.pid)
    live_idx = np.argwhere(pid >= 0)[:5]
    for k, ty, tx in live_idx:
        x[k, ty, tx] = 5.0
        y[k, ty, tx] = 5.0
    st2 = dataclasses.replace(st, x=jnp.asarray(x), y=jnp.asarray(y))
    before = _sorted_particles(st2)
    rb = tiled.rebuild_band(st2, cfg, 0, rows=TY)
    after = _sorted_particles(rb)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(rb.num_active) == int(st2.num_active)
    assert int(rb.overflow_count) == int(st2.overflow_count)
    t, _, _ = tiled.tile_geometry(cfg)
    hty = htx = int(5.0 // t) + 1
    occ_home = int((np.asarray(rb.pid)[:, hty, htx] >= 0).sum())
    assert occ_home == 2  # filled exactly to cap
    # the 3 losers still sit in their ORIGINAL slots
    rb_pid = np.asarray(rb.pid)
    st_pid = np.asarray(st2.pid)
    moved_from = {(int(k), int(ty), int(tx))
                  for k, ty, tx in live_idx}
    placed = {int(st_pid[k, ty, tx]) for k, ty, tx in live_idx} - {
        int(p) for p in rb_pid[:, hty, htx] if p >= 0}
    for k, ty, tx in live_idx:
        p = int(st_pid[k, ty, tx])
        if p in placed:  # a loser: must be untouched
            assert int(rb_pid[k, ty, tx]) == p


def test_one_program_serves_every_band_position():
    """row0 is a traced argument: the jitted band program must not
    retrace/recompile across positions."""
    cfg = _cfg()
    st = _grid_state(cfg, seed=11)
    _, TY, _ = tiled.tile_geometry(cfg)
    rows = max(4, TY // 3)
    traces = []

    @jax.jit
    def band(s, r0):
        traces.append(1)
        return tiled.rebuild_band(s, cfg, r0, rows=rows)

    out = st
    for r0 in (0, 3, TY - rows, 1):
        out = band(out, np.int32(r0))
    assert len(traces) == 1, "band program retraced across positions"
    assert int(out.num_active) == int(st.num_active)


def test_stale_per_row_histogram():
    cfg = _cfg()
    st = _grid_state(cfg, seed=13)
    _, TY, _ = tiled.tile_geometry(cfg)
    assert np.asarray(tiled.stale_per_row(st, cfg)).sum() == 0
    rolled = _displaced(st)
    hist = np.asarray(tiled.stale_per_row(rolled, cfg))
    assert hist.shape == (TY,)
    assert hist.sum() > 0
    # the histogram counts by STORAGE row: rows holding no live slots
    # contribute zero
    live_rows = (np.asarray(rolled.pid) >= 0).any(axis=(0, 2))
    assert (hist[~live_rows] == 0).all()


def test_engine_bands_sweep_hook():
    """tiled_sweep='bands': the periodic sweep appends stale-targeted
    band rebuilds; stale stays small, nobody lost, the counter moves."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _cfg(max_particles=128, initial_particles=96,
               sort_interval_steps=8, tiled_sweep="bands",
               tiled_band_rows=4, tiled_band_k=2)
    eng = TiledEngine(cfg, seed=0, chunk=4)
    eng.run(20)  # crosses two sweep boundaries
    p = eng.positions()
    assert np.isfinite(p).all()
    assert len(p) == 96
    assert eng.band_rebuilds >= 4  # 2 bands per sweep, >= 2 sweeps
    assert float(eng._stale_frac(eng.state)) <= 0.05


def test_sharded_engine_refuses_bands():
    from gpu_physics_engine_tpu.parallel.tiled_shard import (
        ShardedTiledEngine)
    cfg = _cfg(max_particles=128, initial_particles=64,
               tiled_sweep="bands")
    with pytest.raises(ValueError, match="single-chip"):
        ShardedTiledEngine(cfg)


def test_band_lowering_stays_small_at_4m_gs_scale():
    """The band program at the TRUE 4M-GS geometry (960x2773 tiles)
    must stay sort-speed small — abstract lowering only, no compile.
    This is the program the monolithic rebuild could never deliver."""
    from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry

    cfg = SimConfig(max_particles=4_194_304, initial_particles=4_194_304,
                    pipeline="tiled", tile_multiplier=2.2, tile_cap=6,
                    max_occupancy=8, tiled_sweep="bands")
    _, TY, TX = tile_geometry(cfg)
    assert TY * TX > 2_000_000
    shape = (6, TY, TX)
    f = jax.ShapeDtypeStruct(shape, jnp.float32)
    i = jax.ShapeDtypeStruct(shape, jnp.int32)
    s0 = jax.ShapeDtypeStruct((), jnp.int32)
    st = TileState(x=f, y=f, px=f, py=f, radius=f, pid=i,
                   num_active=s0, overflow_count=s0)
    r0 = jax.ShapeDtypeStruct((), jnp.int32)
    hlo = jax.jit(
        lambda s, r: tiled.rebuild_band(s, cfg, r, rows=16)
    ).lower(st, r0).as_text()
    assert hlo.count("\n") < 5_000


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
