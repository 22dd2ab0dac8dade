"""Relocate-interval sweep on hardware: bench-identical methodology
(480-step settle, 480-step timed window incl. two sweep cycles) across
the curve's hard points x tiled_relocate_interval in {1, 2, 4}.

Decision rule: fastest interval whose steady-state deferral stays at or
under ~1%/step (the physics-quality bound, PERF.md).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_sweep_iv.py > /tmp/sweep_iv.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_sweep_iv.jsonl", "a", buffering=1)


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

BASELINE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
            1_048_576: 3.66, 2_000_000: 8.417, 4_194_304: 22.70}
GEOM = {
    512_000: (6.6, 6, 128, "greedy"),
    756_000: (4.4, 4, 32, "greedy"),
    1_048_576: (4.4, 5, 32, "greedy"),
    2_000_000: (4.4, 6, 16, "greedy"),
    4_194_304: (3.3, 6, 16, "greedy"),
    100_000: (22.0, 8, 128, "greedy"),
    256_000: (12.1, 8, 128, "greedy"),
}
SETTLE, WINDOW = 480, 480

for n, (mult, cap, chunk, match) in GEOM.items():
    for iv in (2, 4, 1):
        try:
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=cap,
                            tile_multiplier=mult, tiled_match=match,
                            tiled_relocate_interval=iv)
            eng = TiledEngine(cfg, seed=0, chunk=chunk)
            eng.run(SETTLE)
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / n * 100)
            log(stage="iv_sweep", n=n, mult=mult, cap=cap, chunk=chunk,
                interval=iv, ms_per_step=round(ms, 3),
                defer_pct=round(defer, 3),
                vs_baseline=round(BASELINE[n] / ms, 3),
                hyst=round(cfg.hysteresis_delta, 4))
            del eng
        except Exception:
            log(stage="error", where=f"{n}_iv{iv}",
                err=traceback.format_exc()[-400:])

log(stage="done")
