"""GS parity-persistent layout (gs_layout="par") vs flat on hardware.

Measures the 1M GS engine step (tiled_solver="gs", reference cell
geometry) under gs_layout "flat" vs "par" with the engine's scanned
chunks (the parity layout converts full <-> parity space once per
chunk — ops/gs_parity.py), plus a small-N hardware correctness
cross-check (CPU interpret bit-parity is asserted by
tests/test_gs_parity.py; this catches Mosaic lowering bugs).

Run with the TPU free (one TPU process at a time):
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gspar.py > /tmp/probe_gspar.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gspar.jsonl", "a", buffering=1)


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

# --- hardware correctness cross-check at small N -------------------------
# 8 steps: the par layout's relocate/rank/solve are bit-identical to
# flat on CPU (tests/test_gs_parity.py); ulp-level division rounding on
# the VPU is the only expected hardware deviation (PERF.md GS section)
try:
    outs = {}
    for layout in ("flat", "par"):
        cfg = SimConfig(max_particles=65_536, initial_particles=65_536,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                        gs_layout=layout)
        eng = TiledEngine(cfg, seed=0, chunk=8)
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[layout] = (pid[order], np.asarray(s.x).ravel()[order],
                        np.asarray(s.y).ravel()[order])
        del eng
    same_pids = bool((outs["par"][0] == outs["flat"][0]).all())
    dx = float(np.abs(outs["par"][1] - outs["flat"][1]).max())
    dy = float(np.abs(outs["par"][2] - outs["flat"][2]).max())
    ok = same_pids and dx < 1e-2 and dy < 1e-2
    log(stage="xcheck", n=65_536, same_pids=same_pids,
        dx=round(dx, 6), dy=round(dy, 6), ok=ok)
except Exception:
    log(stage="error", where="xcheck", err=traceback.format_exc()[-400:])

# --- 1M engine step times -------------------------------------------------
SETTLE, WINDOW = 192, 192

for layout, split in (("flat", True), ("par", True), ("par", False)):
    try:
        cfg = SimConfig(max_particles=1_048_576,
                        initial_particles=1_048_576,
                        pipeline="tiled", tiled_solver="gs",
                        tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                        gs_layout=layout, gs_mx_split=split)
        eng = TiledEngine(cfg, seed=0, chunk=32)
        eng.run(SETTLE)
        of0 = float(eng.state.overflow_count)
        ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
        defer = ((float(eng.state.overflow_count) - of0)
                 / (2 * WINDOW) / 1_048_576 * 100.0)
        log(stage="step", n=1_048_576, layout=layout, split=split,
            ms=round(ms, 3), defer_pct=round(defer, 4))
        del eng
    except Exception:
        log(stage="error", n=1_048_576, layout=layout, split=split,
            err=traceback.format_exc()[-400:])

log(stage="done")
