"""Uniform-radius GS specialization (tiled_uniform_radius + gs par) vs
the general parity path, on hardware at 1M.

Expectation: rank drops the 12 radius sub-grid block reads, the rrad
table round-trip and the rad-recovery selects; the sweep drops two
divisions + two maxes per pair.  CPU-bit-identical (tests/
test_gs_uniform.py); on the VPU the general path's runtime division is
itself ulp-approximate, so the xcheck reports |dx| and judges at the
documented <= 2e-6 ulp scale (PERF.md "GS parity").

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gsuni.py > /tmp/probe_gsuni.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gsuni.jsonl", "a", buffering=1)


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

# hardware correctness cross-check (uniform vs general at 64k, 8 steps)
try:
    outs = {}
    for uni in (False, True):
        cfg = SimConfig(max_particles=65_536, initial_particles=65_536,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                        gs_layout="par", tiled_uniform_radius=uni)
        eng = TiledEngine(cfg, seed=0, chunk=8)
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[uni] = (pid[order], np.asarray(s.x).ravel()[order],
                     np.asarray(s.y).ravel()[order])
        del eng
    same = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    log(stage="xcheck", same_pids=same, dx=round(dx, 9), dy=round(dy, 9),
        ok=bool(same and dx <= 2e-6 and dy <= 2e-6))
except Exception:
    log(stage="error", where="xcheck", err=traceback.format_exc()[-400:])

SETTLE, WINDOW = 192, 192

for uni in (False, True):
    try:
        cfg = SimConfig(max_particles=1_048_576,
                        initial_particles=1_048_576,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                        gs_layout="par", gs_mx_split=False,
                        tiled_uniform_radius=uni)
        eng = TiledEngine(cfg, seed=0, chunk=32)
        eng.run(SETTLE)
        ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
        log(stage="step", n=1_048_576, uniform=uni, ms=round(ms, 3))
        del eng
    except Exception:
        log(stage="error", uniform=uni, err=traceback.format_exc()[-400:])

log(stage="done")
