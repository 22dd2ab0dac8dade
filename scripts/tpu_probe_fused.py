"""Probe the fused collide+integrate step on TPU with geometry sweeps.

Logs to /tmp/tpu_probe_fused.jsonl.
Configs (all pipeline=tiled, pallas collide+relocate, fused integrate):
  4M: cap16, cap14, cap12; tile_multiplier 3.3 with cap10
  1M: cap16
Each logs ms/step + deferral rate (physics-quality signal).
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_fused.jsonl", "a", buffering=1)


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

CONFIGS = [
    dict(n=1 << 22, tile_cap=16),
    dict(n=1 << 22, tile_cap=14),
    dict(n=1 << 22, tile_cap=12),
    dict(n=1 << 22, tile_cap=10, tile_multiplier=3.3),
    dict(n=1 << 20, tile_cap=16),
]


def main():
    for c in CONFIGS:
        if time.time() - T0 > 38 * 60:
            log(stage="skip", cfg=c)
            continue
        try:
            n = c.pop("n")
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tiled_collide="pallas",
                            tiled_relocate="pallas", **c)
            tb = time.time()
            eng = TiledEngine(cfg, seed=0)
            eng.run(10)  # settle the violent transient a little
            float(eng.state.x[0, 0, 0])
            compile_s = time.time() - tb
            of0 = int(eng.state.overflow_count)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                eng.run(20)
                float(eng.state.x[0, 0, 0])
                best = min(best, (time.perf_counter() - t0) / 20 * 1e3)
            log(stage="fused_step", n=n, **c,
                ms_per_step=round(best, 3), compile_s=round(compile_s, 1),
                deferred_per_step=round(
                    (int(eng.state.overflow_count) - of0) / 40, 1))
        except Exception:
            log(stage=f"fused {c}", error=traceback.format_exc()[-1000:])
    log(stage="done")


if __name__ == "__main__":
    main()
