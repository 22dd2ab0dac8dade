"""Newton-sweep geometry refinement: IF scripts/tpu_probe_newton.py
confirms the pair-once sweep wins on hardware, the sweep phase gets
~1.5-1.8x cheaper and the speed/quality frontier moves — part of the win
can buy +1 cap (lower deferral) or a shorter relocate interval.  This
sweep re-measures the production picks and their +1-cap / tighter-iv
neighbors with tiled_newton=True, uniform-radius (bench parity).

Run ONLY after tpu_probe_newton confirms xcheck ok + wins (one TPU
process at a time):
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_sweep_iv3.py > /tmp/sweep_iv3.log 2>&1 &

Digest with: python scripts/apply_iv2.py --newton /tmp/tpu_sweep_iv3.jsonl
(rows log newton=True; apply_iv2 excludes them unless --newton is given —
only adopt newton picks together with flipping tiled_newton on in bench).
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_sweep_iv3.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.core.tuned import TUNED_TILE_GEOMETRY  # noqa: E402

BASELINE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
            1_048_576: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
            4_194_304: 22.70}

# per size: the tuned pick re-measured under newton, plus +1 cap and
# (where interval > 1) a tighter interval — the directions the cheaper
# sweep is expected to afford
RUNS = []
for n, (mult, cap, chunk, match, iv) in TUNED_TILE_GEOMETRY.items():
    RUNS.append((n, mult, cap, chunk, match, iv))
    RUNS.append((n, mult, cap + 1, chunk, match, iv))
    if iv > 1:
        RUNS.append((n, mult, cap, chunk, match, max(1, iv // 2)))

SETTLE, WINDOW = 480, 480

for n, mult, cap, chunk, match, iv in RUNS:
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match=match,
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        eng.run(SETTLE)
        of0 = float(eng.state.overflow_count)
        t0 = time.perf_counter()
        eng.run(WINDOW)
        float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / WINDOW * 1e3
        defer = ((float(eng.state.overflow_count) - of0)
                 / WINDOW / n * 100)
        log(stage="iv2", n=n, mult=mult, cap=cap, chunk=chunk, interval=iv,
            uniform=True, newton=True,
            ms_per_step=round(ms, 3), defer_pct=round(defer, 3),
            defer_per_event=round(defer * iv, 3),
            vs_baseline=round(BASELINE[n] / ms, 3))
        del eng
    except Exception:
        log(stage="error", where=f"{n}_c{cap}_iv{iv}_newton",
            err=traceback.format_exc()[-400:])

log(stage="done")
