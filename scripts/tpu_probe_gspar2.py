"""gs_par_fused (one kernel per phase over all four parities — 4x less
input HBM traffic) vs the unfused parity layout, on hardware at 1M.

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gspar2.py > /tmp/probe_gspar2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gspar2.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import numpy as np  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

# hardware correctness cross-check (fused vs unfused at 64k, 8 steps)
try:
    outs = {}
    for fused in (False, True):
        cfg = SimConfig(max_particles=65_536, initial_particles=65_536,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                        gs_layout="par", gs_par_fused=fused)
        eng = TiledEngine(cfg, seed=0, chunk=8)
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[fused] = (pid[order], np.asarray(s.x).ravel()[order],
                       np.asarray(s.y).ravel()[order])
        del eng
    same = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    log(stage="xcheck", same_pids=same, dx=round(dx, 7), dy=round(dy, 7),
        ok=bool(same and dx == 0.0 and dy == 0.0))
except Exception:
    log(stage="error", where="xcheck", err=traceback.format_exc()[-400:])

SETTLE, WINDOW = 192, 192

for fused in (False, True):
    try:
        cfg = SimConfig(max_particles=1_048_576,
                        initial_particles=1_048_576,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                        gs_layout="par", gs_mx_split=False,
                        gs_par_fused=fused)
        eng = TiledEngine(cfg, seed=0, chunk=32)
        eng.run(SETTLE)
        ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
        log(stage="step", n=1_048_576, fused=fused, ms=round(ms, 3))
        del eng
    except Exception:
        log(stage="error", fused=fused, err=traceback.format_exc()[-400:])

log(stage="done")
