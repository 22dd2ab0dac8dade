"""Interactive session against the real chip (VERDICT r2 item 8).

Drives the R8/R9 stack end-to-end over the tunnel, like a user at the
reference's window (app.rs:31-100): 1M tuned tiled engine, device
render + frame download EVERY frame, a mouse-attractor drag, a spawn
burst, and a pan/zoom camera move.  Records achieved fps and
input-to-frame latency (press_mouse -> first downloaded frame that
includes the step that saw it).

The tunnel bounds this loop, not the chip: each frame pays ~2 dispatches
(~4-6 ms each) + a 2.7 MB image download (~43 ms at ~64 MB/s) — the
honest interactive budget for a remote TPU.  Results -> PERF.md.

Run with the TPU free:
  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_interactive.py > /tmp/probe_interactive.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_interactive.jsonl", "a", buffering=1)


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

try:
    from gpu_physics_engine_tpu import make_tuned_engine
    from gpu_physics_engine_tpu.render.device import autofit_rect

    N = 1_048_576
    eng = make_tuned_engine(N, seed=0)
    eng.run(64)  # settle + compile the step
    frame = eng.render_frame()  # compile the render path
    assert frame.shape == (720, 1280, 3)
    log(stage="ready", n=N, cap=eng.config.tile_cap)

    # --- free-run: 120 frames, sim+render+download every frame --------
    times = []
    for i in range(120):
        t0 = time.perf_counter()
        eng.step()
        frame = eng.render_frame()
        times.append(time.perf_counter() - t0)
    arr = np.array(times) * 1e3
    log(stage="freerun", frames=120, fps=round(1e3 / arr.mean(), 1),
        ms_mean=round(float(arr.mean()), 1),
        ms_p50=round(float(np.percentile(arr, 50)), 1),
        ms_p95=round(float(np.percentile(arr, 95)), 1))

    # --- input-to-frame latency: press -> downloaded frame ------------
    lat = []
    for i in range(10):
        eng.release_mouse()
        eng.step()
        eng.render_frame()
        t0 = time.perf_counter()
        eng.press_mouse((1524.0, 524.0))   # the input event
        eng.step()                          # first step that saw it
        eng.render_frame()                  # first frame showing it
        lat.append(time.perf_counter() - t0)
    arr = np.array(lat) * 1e3
    log(stage="latency", ms_mean=round(float(arr.mean()), 1),
        ms_p50=round(float(np.percentile(arr, 50)), 1))

    # --- attractor drag: 120 frames with the mouse pressed ------------
    before = eng.positions()
    d0 = float(np.hypot(before[:, 0] - 1524.0, before[:, 1] - 524.0).mean())
    for i in range(120):
        eng.move_mouse((1524.0 + 40 * np.sin(i / 15.0), 524.0))
        eng.step()
        eng.render_frame()
    after = eng.positions()
    d1 = float(np.hypot(after[:, 0] - 1524.0, after[:, 1] - 524.0).mean())
    eng.release_mouse()
    log(stage="drag", mean_dist_before=round(d0, 1),
        mean_dist_after=round(d1, 1), attracted=bool(d1 < d0))

    # --- spawn burst (P key) -------------------------------------------
    n0 = eng.num_particles()
    eng.spawn_at((800.0, 700.0), verbose=False)
    for _ in range(30):
        eng.step()
        eng.render_frame()
    log(stage="spawn", before=n0, after=eng.num_particles(),
        finite=bool(np.isfinite(eng.positions()).all()))

    # --- camera pan/zoom (rect is traced: no recompile) ----------------
    t0 = time.perf_counter()
    for i in range(30):
        r = autofit_rect(eng.config, 1280, 720)
        z = 1.0 + i * 0.05
        cx, cy = 1524.0, 524.0
        w = (r[2] - r[0]) / z
        h = (r[3] - r[1]) / z
        eng.render_frame(rect=(cx - w / 2, cy - h / 2,
                               cx + w / 2, cy + h / 2))
    log(stage="zoom", frames=30,
        ms_per_frame=round((time.perf_counter() - t0) / 30 * 1e3, 1))
    log(stage="done", ok=True)
except Exception:
    log(stage="error", err=traceback.format_exc()[-600:])
