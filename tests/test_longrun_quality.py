"""Long-horizon storage-quality regression on CPU (VERDICT r2 item 5).

Locks the round-2 honest-metric switch with a test: over a long tiny-
scale run (2 080 steps = 8+ full 240-step sweep cycles) the stale-pair
fraction (>= 2-tile storage displacement — the collision-missing
class) must stay bounded at every sampled window, and the deferral
events must not accelerate (the DESIGN.md §9 jam signature).  The
hardware analog at production sizes is scripts/tpu_probe_horizon20k.py
(>= 20k steps at 512k/4M).

Dense scene on purpose (~85% area fill — the jam-prone class); small
world so the CPU compile stays cheap.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.ops.tiled import stale_pair_fraction  # noqa: E402


def test_dense_longrun_stale_pairs_stay_bounded():
    rng = np.random.default_rng(3)
    W = H = 24.0
    n = int(0.85 * W * H / (np.pi * 0.25))
    pos = np.stack([rng.uniform(0.6, W - 0.6, n),
                    rng.uniform(0.6, H - 0.6, n)], -1).astype(np.float32)
    rad = np.full(n, 0.5, np.float32)
    cfg = SimConfig(max_particles=1024, initial_particles=n,
                    world_width=W, world_height=H, initial_radius=0.5,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                    tiled_match="flip", tiled_collide="pallas",
                    tiled_relocate="pallas", tiled_uniform_radius=True)
    eng = TiledEngine.from_arrays(cfg, pos, rad)
    stale_fn = jax.jit(lambda s: stale_pair_fraction(s, eng.config))

    deltas, stales = [], []
    for _ in range(4):
        of0 = float(eng.state.overflow_count)
        eng.run(520)
        deltas.append(float(eng.state.overflow_count) - of0)
        stales.append(float(stale_fn(eng.state)) * 100.0)

    # the quality bound the BENCH curve publishes: stale <= 1% at every
    # sampled boundary (production measures <= 0.4%; tiny worlds are
    # noisier)
    assert max(stales) <= 1.0, stales
    # no jam: deferral must not accelerate across windows
    assert deltas[-1] <= 2 * max(deltas[1], 1) + n // 50, deltas
    # and the engine never needed self-defense
    assert eng.watchdog_events == 0
    assert np.isfinite(eng.positions()).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
