"""Storage-jam watchdog (SimConfig.tiled_watchdog, DESIGN.md §9).

The jam's runtime signature is a stale-pair POPULATION (>= 2-tile
storage displacement, ops/tiled.stale_pair_fraction) that grows across
run() windows.  The test drives that signature deterministically:
between windows it teleports a growing set of particles several tiles
from their storage (position moves, storage stays — exactly what
accumulating deferred movers look like) and asserts the engine detects
the growth, escalates through all three mitigation levels (forced
exact sweep -> hysteresis off -> +1 slot capacity), counts the events,
and ends recovered (stale population back under the bound).

Reference contrast: the reference silently drops pairs past K=6
(grid.wgsl membership); this engine degrades loudly and self-heals.

Tiny config per the CPU compile discipline (CLAUDE.md): cap 3, 48
particles, flip matching.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402


def _engine():
    cfg = SimConfig(max_particles=64, initial_particles=64,
                    world_width=96.0, world_height=8.0,
                    initial_radius=0.5, pipeline="tiled", tile_cap=3,
                    max_occupancy=4, tile_multiplier=2.2,
                    tiled_match="flip", tiled_hysteresis=0.2,
                    tiled_watchdog_pct=4.0, sweep_mover_capacity=64,
                    tiled_collide="pallas", tiled_relocate="pallas")
    rng = np.random.default_rng(0)
    n = 48
    # left half, roughly one per tile so cap 3 holds comfortably
    pos = np.stack([rng.uniform(1.0, 40.0, n),
                    rng.uniform(1.0, 7.0, n)], -1).astype(np.float32)
    rad = np.full(n, 0.5, np.float32)
    return TiledEngine.from_arrays(cfg, pos, rad)


def _inject(eng, count: int, hops: float = 5.0):
    """Teleport ``count`` live particles +hops tiles in x (position
    moves, storage slot stays) — the displaced-population signature.
    px moves by the same amount: the displacement must not read as a
    Verlet velocity (a 5-tile/step runaway would out-run any relocate
    and the watchdog could never 'recover')."""
    t = eng.cell_size()
    x = np.asarray(eng.state.x).copy()
    px = np.asarray(eng.state.px).copy()
    live = np.asarray(eng.state.pid).ravel() >= 0
    idx = np.nonzero(live)[0][:count]
    xf, pf = x.ravel(), px.ravel()
    shift = np.minimum(xf[idx] + hops * t,
                       eng.config.world_width - 1.0) - xf[idx]
    xf[idx] += shift
    pf[idx] += shift
    eng.state = dataclasses.replace(
        eng.state, x=jax.numpy.asarray(xf.reshape(x.shape)),
        px=jax.numpy.asarray(pf.reshape(px.shape)))


def test_watchdog_detects_escalates_recovers(capsys):
    eng = _engine()
    cap0 = eng.config.tile_cap
    assert eng.config.tiled_watchdog
    eng.run(2)                       # first boundary: baseline sample
    assert eng.watchdog_events == 0

    _inject(eng, 16)
    eng.run(2)                       # growth past bound -> level 1
    assert eng.watchdog_events == 1
    assert eng._wd_level == 1
    # level 1 = forced exact sweep: backlog drained
    disp = float(jax.jit(lambda s: tiled.stale_pair_fraction(
        s, eng.config))(eng.state)) * 100.0
    assert disp <= eng.config.tiled_watchdog_pct

    _inject(eng, 24)
    eng.run(2)                       # re-trigger -> level 2
    assert eng.watchdog_events == 2
    assert eng._wd_level == 2
    assert eng.config.tiled_hysteresis == 0.0  # hysteresis disabled

    _inject(eng, 32)
    eng.run(2)                       # re-trigger -> level 3: cap growth
    assert eng.watchdog_events == 3
    assert eng.config.tile_cap == cap0 + 1
    assert eng._wd_level == 2        # cap growth stays repeatable

    eng.run(2)                       # no injection: recovered, no event
    assert eng.watchdog_events == 3
    disp = float(jax.jit(lambda s: tiled.stale_pair_fraction(
        s, eng.config))(eng.state)) * 100.0
    assert disp <= eng.config.tiled_watchdog_pct
    out = capsys.readouterr().out
    assert "[tiled][watchdog]" in out


def test_watchdog_quiet_on_healthy_run():
    eng = _engine()
    for _ in range(4):
        eng.run(2)
    assert eng.watchdog_events == 0


def test_watchdog_runaway_ceiling_catches_flat_creep(capsys):
    """A stale population past 4x the bound trips the watchdog even
    when the slope gate reads 'not growing' — the round-5 hardware
    probe rode 5% -> 26% in +10-13%/boundary increments without one
    trip (docs/probes_r5/tpu_probe_gs_bands.jsonl).  Plateau-runaway
    drains (level 1) but must NOT ratchet hysteresis/cap without a
    growth signal."""
    eng = _engine()  # bound 4% -> runaway ceiling 16%
    cap0 = eng.config.tile_cap
    eng.run(2)  # baseline boundary (prev set)
    _inject(eng, 24)  # ~50% stale, far past the ceiling
    eng.run(2)  # slope trip (growing)
    ev1 = eng.watchdog_events
    assert ev1 >= 1
    # re-inject the SAME level each boundary: no growth, still runaway
    for _ in range(2):
        _inject(eng, 24)
        # force prev to the same high level so the slope gate is cold
        eng._wd_prev = float(jax.jit(lambda s: tiled.stale_pair_fraction(
            s, eng.config))(eng.state)) * 100.0
        eng._watchdog()
    assert eng.watchdog_events >= ev1 + 2, "runaway ceiling never fired"
    assert eng.config.tile_cap == cap0, (
        "plateau-runaway must not ratchet capacity")
    assert "[tiled][watchdog]" in capsys.readouterr().out


def test_watchdog_off_switch():
    eng = None
    cfg_off = dict(tiled_watchdog=False)
    eng = _engine()
    eng.config = eng.config.replace(**cfg_off)
    _inject(eng, 24)
    eng.run(2)
    eng.run(2)
    assert eng.watchdog_events == 0


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
