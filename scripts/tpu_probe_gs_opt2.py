"""GS optimization round 2: fused-integrate verification + stacked
config timing (run after tpu_probe_gs_opt.py picks cap/match).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_opt2.py > /tmp/probe_gs_opt2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_opt2.jsonl", "a", buffering=1)


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


# --- fused-integrate hardware xcheck (64k, 8 steps, mouse pressed) -------
try:
    outs = {}
    for fuse in (False, True):
        eng = TiledEngine(gs_cfg(65_536, gs_fuse_integrate=fuse),
                          seed=0, chunk=8)
        eng.press_mouse((1524.0, 524.0))  # exercise the attractor path
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[fuse] = (pid[order], np.asarray(s.x).ravel()[order],
                      np.asarray(s.y).ravel()[order],
                      np.asarray(s.px).ravel()[order])
        del eng
    same = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    dpx = float(np.abs(outs[True][3] - outs[False][3]).max())
    log(stage="fuseint_xcheck", same_pids=same, dx=dx, dy=dy, dpx=dpx,
        ok=same and dx == 0.0 and dy == 0.0 and dpx == 0.0)
except Exception:
    log(stage="error", name="fuseint_xcheck",
        err=traceback.format_exc()[-400:])


def timed(name, n, **kw):
    try:
        chunk = kw.pop("chunk", 32)
        eng = TiledEngine(gs_cfg(n, **kw), seed=0, chunk=chunk)
        eng.run(SETTLE)
        float(eng.state.x[0, 0, 0])
        ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
        log(stage="time", name=name, n=n, ms=round(ms, 3),
            vs_1m_baseline=round(3.66 / ms, 3))
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])


# stacked: r-drop (already in) + fused integrate, at cap5 and cap4
timed("cap5_fuseint", 1_048_576, cap=5, gs_fuse_integrate=True)
timed("cap4_fuseint", 1_048_576, cap=4, gs_fuse_integrate=True)
timed("cap4_fuseint_flip", 1_048_576, cap=4, gs_fuse_integrate=True,
      tiled_match="flip")
log(stage="done")
