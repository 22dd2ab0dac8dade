"""gs_colors_mega hardware verification + timing (ops/gs_mega.py).

1. xcheck: 64k GS engine, 8 steps, mega vs sequential color kernels —
   pids identical, dx=dy=dpx=0.0 required (same arithmetic, different
   blocking).
2. timing @1M cap4 (+fused integrate) and @2M cap5: the color passes
   are the largest traffic share; the mega window cuts them ~2x.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_mega.py > /tmp/probe_gs_mega.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_mega.jsonl", "a", buffering=1)


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

SETTLE, WINDOW = 288, 240


def gs_cfg(n, cap=5, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=6,
                     tiled_uniform_radius=True, **kw)


# --- bit xcheck at 64k (mouse pressed to exercise the integrate tail) ---
try:
    outs = {}
    for mega in (False, True):
        eng = TiledEngine(gs_cfg(65_536, gs_colors_mega=mega),
                          seed=0, chunk=8)
        eng.press_mouse((1524.0, 524.0))
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[mega] = (pid[order], np.asarray(s.x).ravel()[order],
                      np.asarray(s.y).ravel()[order],
                      np.asarray(s.px).ravel()[order],
                      int(s.overflow_count))
        del eng
    same = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    dpx = float(np.abs(outs[True][3] - outs[False][3]).max())
    ok = (same and dx == 0.0 and dy == 0.0 and dpx == 0.0
          and outs[True][4] == outs[False][4])
    log(stage="mega_xcheck", same_pids=same, dx=dx, dy=dy, dpx=dpx,
        overflow=(outs[True][4], outs[False][4]), ok=ok)
    if not ok:
        raise RuntimeError("mega xcheck failed")
except Exception:
    log(stage="error", name="mega_xcheck",
        err=traceback.format_exc()[-500:])
    raise SystemExit(1)


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


# --- relocate_mega bit xcheck (plan+apply fused) --------------------------
try:
    outs = {}
    for rmega in (False, True):
        eng = TiledEngine(gs_cfg(65_536, gs_relocate_mega=rmega),
                          seed=0, chunk=8)
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[rmega] = (pid[order], np.asarray(s.x).ravel()[order],
                       np.asarray(s.y).ravel()[order],
                       int(s.overflow_count))
        del eng
    same = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    ok = (same and dx == 0.0 and dy == 0.0
          and outs[True][3] == outs[False][3])
    log(stage="rmega_xcheck", same_pids=same, dx=dx, dy=dy,
        overflow=(outs[True][3], outs[False][3]), ok=ok)
    rmega_ok = ok
except Exception:
    log(stage="error", name="rmega_xcheck",
        err=traceback.format_exc()[-500:])
    rmega_ok = False

timed("mega_1m_cap4", 1_048_576, cap=4, gs_colors_mega=True)
timed("mega_1m_cap4_c64", 1_048_576, cap=4, chunk=64,
      gs_colors_mega=True)
if rmega_ok:
    timed("mega_both_1m_cap4_c64", 1_048_576, cap=4, chunk=64,
          gs_colors_mega=True, gs_relocate_mega=True)
timed("mega_2m_cap5", 2_000_000, cap=5, chunk=32, gs_colors_mega=True,
      gs_relocate_mega=rmega_ok)
timed("seq_2m_cap5", 2_000_000, cap=5, chunk=32)
timed("mega_4m_cap6", 4_194_304, cap=6, chunk=16, gs_colors_mega=True,
      gs_relocate_mega=rmega_ok)
log(stage="done")
