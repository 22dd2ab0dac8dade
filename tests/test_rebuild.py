"""ops/tiled.rebuild: wholesale sort-rebuild of tile storage.

relocate's free-slot claims cannot resolve displacement chains across
full tiles (measured compounding stale residue at 4M GS density —
docs/probes_r3/tpu_probe_gs4m_cadence.jsonl); rebuild re-slots every
live particle at its home tile in one stable sort.  These lock the
contract: nobody lost, stale-pair fraction goes to zero, demand
overflow goes to free slots (not dropped), idempotent, and the engine
sweep hook runs it.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

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


def test_rebuild_restores_displaced_storage():
    cfg = _cfg()
    st = _grid_state(cfg)
    before = _sorted_particles(st)
    # displace EVERY particle's storage by two tiles in both axes
    # (the >= 2-tile collision-missing class the stale metric counts):
    # rolls move slots, positions stay — a displacement chain relocate
    # cannot fully fix in one budgeted pass, rebuild must fix in one
    rolled = dataclasses.replace(
        st, **{f: jnp.roll(getattr(st, f), (2, 2), axis=(1, 2))
               for f in ("x", "y", "px", "py", "radius", "pid")})
    assert float(tiled.stale_pair_fraction(rolled, cfg)) > 0.0
    rb = tiled.rebuild(rolled, cfg)
    assert float(tiled.stale_pair_fraction(rb, cfg)) == 0.0
    after = _sorted_particles(rb)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(rb.num_active) == int(st.num_active)
    assert int(rb.overflow_count) == int(st.overflow_count)


def test_rebuild_home_demand_over_cap_goes_to_free_slots():
    cfg = _cfg(tile_cap=2)
    st = _grid_state(cfg, n=24, seed=5)
    # cram 5 particles' HOMES into one interior cell: 2 win the home
    # slots, 3 must land in free slots elsewhere — never dropped
    x = np.asarray(st.x).copy()
    y = np.asarray(st.y).copy()
    pid = np.asarray(st.pid)
    live_idx = np.argwhere(pid >= 0)[:5]
    for k, ty, tx in live_idx:
        x[k, ty, tx] = 5.0
        y[k, ty, tx] = 5.0
    st2 = dataclasses.replace(st, x=jnp.asarray(x), y=jnp.asarray(y))
    before = _sorted_particles(st2)
    rb = tiled.rebuild(st2, cfg)
    after = _sorted_particles(rb)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    assert int(rb.num_active) == int(st2.num_active)
    assert int(rb.overflow_count) == int(st2.overflow_count)
    # home tile holds exactly cap of the 5 claimants
    t, TY, TX = tiled.tile_geometry(cfg)
    hty, htx = int(5.0 // t) + 1, int(5.0 // t) + 1
    occ_home = int((np.asarray(rb.pid)[:, hty, htx] >= 0).sum())
    assert occ_home == 2


def test_rebuild_idempotent():
    cfg = _cfg()
    st = _grid_state(cfg, seed=11)
    r1 = tiled.rebuild(st, cfg)
    r2 = tiled.rebuild(r1, cfg)
    for f in ("x", "y", "px", "py", "radius", "pid"):
        np.testing.assert_array_equal(np.asarray(getattr(r1, f)),
                                      np.asarray(getattr(r2, f)))


def test_engine_sweep_rebuild_hook():
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _cfg(max_particles=128, initial_particles=96,
               sort_interval_steps=8, tiled_sweep="rebuild")
    eng = TiledEngine(cfg, seed=0, chunk=4)
    eng.run(20)  # crosses two sweep boundaries
    p = eng.positions()
    assert np.isfinite(p).all()
    assert len(p) == 96
    assert float(eng._stale_frac(eng.state)) <= 0.05


def test_engine_hybrid_rebuild_every():
    """tiled_rebuild_every=k: every k-th periodic sweep runs the
    wholesale rebuild (counted in eng.rebuild_sweeps), the others stay
    the budgeted relocate; nobody is lost and physics stays finite."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = _cfg(max_particles=128, initial_particles=96,
               sort_interval_steps=8, tiled_rebuild_every=2)
    eng = TiledEngine(cfg, seed=0, chunk=4)
    assert eng._sweep_rb is not None
    eng.run(40)  # 4 sweep boundaries (steps 8, 16, 24, 32 inside run)
    assert eng._sweep_count >= 4
    # every 2nd sweep was a rebuild
    assert eng.rebuild_sweeps == eng._sweep_count // 2
    p = eng.positions()
    assert np.isfinite(p).all()
    assert len(p) == 96
    # pure-rebuild config must NOT build the hybrid twin
    cfg2 = _cfg(max_particles=128, initial_particles=96,
                sort_interval_steps=8, tiled_sweep="rebuild",
                tiled_rebuild_every=2)
    assert TiledEngine(cfg2, seed=0, chunk=4)._sweep_rb is None


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))


def test_rebuild_gather_bitwise_equals_payload():
    """The 2-payload-sort + gather flavor must place every particle in
    the IDENTICAL slot as the 7-payload value sort (the stable
    (key, src) sort induces the same permutation) — displaced scene
    AND the crammed over-capacity scene."""
    cfg = _cfg()
    st = _grid_state(cfg, seed=21)
    rolled = dataclasses.replace(
        st, **{f: jnp.roll(getattr(st, f), (2, 2), axis=(1, 2))
               for f in ("x", "y", "px", "py", "radius", "pid")})
    a = tiled.rebuild(rolled, cfg)
    b = tiled.rebuild_gather(rolled, cfg)
    for f in ("x", "y", "px", "py", "radius", "pid"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), f)
    assert int(a.num_active) == int(b.num_active)
    assert int(a.overflow_count) == int(b.overflow_count)

    # over-capacity homes: loser zip order must match too
    cfg2 = _cfg(tile_cap=2)
    st2 = _grid_state(cfg2, n=24, seed=5)
    x = np.asarray(st2.x).copy()
    y = np.asarray(st2.y).copy()
    pid = np.asarray(st2.pid)
    for k, ty, tx in np.argwhere(pid >= 0)[:5]:
        x[k, ty, tx] = 5.0
        y[k, ty, tx] = 5.0
    st2 = dataclasses.replace(st2, x=jnp.asarray(x), y=jnp.asarray(y))
    a2 = tiled.rebuild(st2, cfg2)
    b2 = tiled.rebuild_gather(st2, cfg2)
    for f in ("x", "y", "px", "py", "radius", "pid"):
        np.testing.assert_array_equal(np.asarray(getattr(a2, f)),
                                      np.asarray(getattr(b2, f)), f)


def test_engine_rebuild_impl_gather_hook(monkeypatch):
    """The impl knob must actually dispatch to rebuild_gather — the two
    flavors are bit-identical, so without tracing the call a broken/
    inverted dispatch would be invisible to every output assert."""
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    calls = {"gather": 0, "payload": 0}
    real_gather = tiled.rebuild_gather
    real_payload = tiled.rebuild

    def spy_gather(*a, **kw):
        calls["gather"] += 1
        return real_gather(*a, **kw)

    def spy_payload(*a, **kw):
        calls["payload"] += 1
        return real_payload(*a, **kw)

    monkeypatch.setattr(tiled, "rebuild_gather", spy_gather)
    monkeypatch.setattr(tiled, "rebuild", spy_payload)
    cfg = _cfg(max_particles=128, initial_particles=96,
               sort_interval_steps=8, tiled_sweep="rebuild",
               tiled_rebuild_impl="gather")
    eng = TiledEngine(cfg, seed=0, chunk=4)
    eng.run(20)
    assert calls["gather"] >= 1, "gather impl was never dispatched"
    assert calls["payload"] == 0, "payload impl ran under impl='gather'"
    p = eng.positions()
    assert np.isfinite(p).all()
    assert len(p) == 96
    assert float(eng._stale_frac(eng.state)) <= 0.05


def test_rebuild_lowering_stays_small_at_4m_scale():
    """The rebuild is sort-speed by construction: its jaxpr must stay
    O(1) in world size (sort + scans + scatters — no per-tile or
    per-cap unrolls).  Lock the lowered-HLO size at the full 4M GS
    geometry (960x2773 tiles, 15.9M slots) — abstract lowering only,
    no compile, so this is cheap on CPU.  (Measured: 791 lines; a
    future unroll regression would explode this by orders of
    magnitude.)"""
    import jax
    import jax.numpy as jnp

    from gpu_physics_engine_tpu.ops.tiled import TileState, tile_geometry

    cfg = SimConfig(max_particles=4_194_304, initial_particles=4_194_304,
                    pipeline="tiled", tile_multiplier=2.2, tile_cap=6,
                    max_occupancy=8, tiled_sweep="rebuild")
    _, TY, TX = tile_geometry(cfg)
    assert TY * TX > 2_000_000  # really the production-scale grid
    shape = (6, TY, TX)
    f = jax.ShapeDtypeStruct(shape, jnp.float32)
    i = jax.ShapeDtypeStruct(shape, jnp.int32)
    s0 = jax.ShapeDtypeStruct((), jnp.int32)
    st = TileState(x=f, y=f, px=f, py=f, radius=f, pid=i,
                   num_active=s0, overflow_count=s0)
    hlo = jax.jit(lambda s: tiled.rebuild(s, cfg)).lower(st).as_text()
    assert hlo.count("\n") < 5_000
    # the gather flavor exists to be a SMALLER program — lock its size
    # too (and that it is in fact no bigger than the payload sort)
    hlo_g = jax.jit(
        lambda s: tiled.rebuild_gather(s, cfg)).lower(st).as_text()
    assert hlo_g.count("\n") < 5_000
    assert hlo_g.count("\n") <= hlo.count("\n") + 500
