"""GS optimization matrix, honestly timed (VERDICT r2 item 1).

The capk_time/cap_recheck numbers in the earlier round-3 probes were
single-window and swallowed the periodic exact sweep's FIRST compile
(~20 s) — worthless.  This probe settles past the first sweep cadence
(>= 240 steps) and takes min over two windows, like bench.py.

Matrix @1M (exact reference semantics, uniform, r-drop):
  (cap, chunk, match):  (5,32,auto) baseline | (4,32,auto) cap narrow
  (occ_max=3 at 1M; cap4/K6 bit-exact per tpu_probe_gs_curve capk)
  | (4,64,auto) deeper scan | (4,32,flip) cheaper relocate matching
  (matching changes STORAGE only; membership rank covers +-1 cell, so
  1-hop deferral lag preserves exactness — xchecked at 256k below).

Then 4M GS at cap6/cap7: the curve probe's cap5 CLIPPED storage
(occ_hist saturated) = refused inserts at init = lost particles = not
reference-exact.  Find the cap that holds 4M and its honest ms.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_opt.py > /tmp/probe_gs_opt.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_opt.jsonl", "a", buffering=1)


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

SETTLE, WINDOW = 288, 240  # settle crosses the 240-step sweep compile


def gs_cfg(n, cap=5, K=6, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=K,
                     tiled_uniform_radius=True, **kw)


def timed_engine(name, n, cap, chunk, **kw):
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
        occ = (np.asarray(eng.state.pid) >= 0).sum(0)
        log(stage="time", name=name, n=n, cap=cap, chunk=chunk,
            ms=round(ms, 3), occ_max=int(occ.max()),
            overflow=float(eng.state.overflow_count),
            wd=eng.watchdog_events, **{k: str(v) for k, v in kw.items()})
        del eng
    except Exception:
        log(stage="error", name=name, err=traceback.format_exc()[-400:])


# --- flip-matching exactness xcheck at 256k (8 steps vs auto) -----------
try:
    outs = {}
    for match in ("auto", "flip"):
        eng = TiledEngine(gs_cfg(256_000, cap=4, tiled_match=match),
                          seed=0, chunk=8)
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        m = pid >= 0
        order = np.argsort(pid[m])
        outs[match] = (pid[m][order], np.asarray(s.x).ravel()[m][order],
                       np.asarray(s.y).ravel()[m][order])
        del eng
    same = bool((outs["auto"][0] == outs["flip"][0]).all())
    dx = float(np.abs(outs["auto"][1] - outs["flip"][1]).max())
    dy = float(np.abs(outs["auto"][2] - outs["flip"][2]).max())
    log(stage="flip_xcheck", same_pids=same, dx=dx, dy=dy,
        ok=same and dx == 0.0 and dy == 0.0)
except Exception:
    log(stage="error", name="flip_xcheck",
        err=traceback.format_exc()[-400:])

# --- 1M matrix ------------------------------------------------------------
timed_engine("base", 1_048_576, cap=5, chunk=32)
timed_engine("cap4", 1_048_576, cap=4, chunk=32)
timed_engine("cap4_c64", 1_048_576, cap=4, chunk=64)
timed_engine("cap4_flip", 1_048_576, cap=4, chunk=32, tiled_match="flip")

# --- 4M storage-true GS ----------------------------------------------------
for cap in (6, 7):
    try:
        eng = TiledEngine(gs_cfg(4_194_304, cap=cap), seed=0, chunk=16)
        of_init = float(eng.state.overflow_count)
        occ = (np.asarray(eng.state.pid) >= 0).sum(0)
        log(stage="4m_init", cap=cap, refused_inserts=of_init,
            occ_max=int(occ.max()),
            exact=bool(of_init == 0.0))
        if of_init == 0.0:
            eng.run(SETTLE)
            float(eng.state.x[0, 0, 0])
            ms = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                eng.run(WINDOW)
                float(eng.state.x[0, 0, 0])
                ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
            log(stage="4m_time", cap=cap, ms=round(ms, 3),
                vs_baseline=round(22.7 / ms, 3))
            del eng
            break
        del eng
    except Exception:
        log(stage="error", name=f"4m_cap{cap}",
            err=traceback.format_exc()[-400:])
log(stage="done")
