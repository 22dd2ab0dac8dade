"""Decontaminated colors-mega timings (ops/gs_mega.colors_mega).

tpu_probe_gs_mega run 2 timed 2M/4M with gs_relocate_mega=True, which
the 1M A/B showed LOSES ~1.6 ms (mega_both 9.95 vs colors-only 8.33).
This probe times colors-mega ONLY (relocate sequential) at the cap
classes the first run contaminated, plus the cap3 dilute class, so
GS_FLAGS / per-size mega enablement can be decided per cap:

  cap3 (100k) · cap4 @1M seq-vs-mega re-pin · cap5 (2M) · cap6 (4M)

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_mega3.py > /tmp/probe_gs_mega3.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_mega3.jsonl", "a", buffering=1)


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

SETTLE, WINDOW = 288, 240


def gs_cfg(n, cap=5, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=6,
                     tiled_uniform_radius=True, **kw)


def timed(name, n, cap, chunk=32, **kw):
    try:
        eng = TiledEngine(gs_cfg(n, cap=cap, **kw), seed=0, chunk=chunk)
        eng.run(SETTLE)
        float(eng.state.x[0, 0, 0])
        ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
        log(stage="time", name=name, n=n, cap=cap, ms=round(ms, 3))
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])


# cap5 class (2M): the contaminated row was 13.94 vs seq 10.24
timed("mega_2m_cap5_colorsonly", 2_000_000, cap=5, chunk=32,
      gs_colors_mega=True)
# cap6 class (4M): decontaminated + its seq pin in the same process
timed("mega_4m_cap6_colorsonly", 4_194_304, cap=6, chunk=16,
      gs_colors_mega=True)
timed("seq_4m_cap6", 4_194_304, cap=6, chunk=16)
# cap3 dilute class (100k): grid is the same 2.65M cells
timed("mega_100k_cap3_colorsonly", 100_000, cap=3, chunk=64,
      gs_colors_mega=True)
timed("seq_100k_cap3", 100_000, cap=3, chunk=64)
# 1M same-process seq pin (cross-process drift guard for the 8.33)
timed("seq_1m_cap4", 1_048_576, cap=4, chunk=64)
timed("mega_1m_cap4_colorsonly", 1_048_576, cap=4, chunk=64,
      gs_colors_mega=True)
log(stage="done")
