"""Fused step+render frame on hardware: one dispatch vs two per frame.

Round-4 preview probe (docs/probes_r4/tpu_probe_preview.jsonl) measured
the two-dispatch interactive loop at 41.3 ms p50 @1M scale 4 (24.2 fps)
and diagnosed the floor as dispatch-bound: two dispatched programs per
displayed frame at ~5-6 ms each over the tunnel plus the download.
TiledEngine.step_render_frame fuses sim step + device render into ONE
dispatched program per (w, h, relocate-phase).  Measure the honest A/B
in one process: split (step(); render_frame()) vs fused at scales 4/2/1
on the 1M tuned engine, plus fused at 4M scale 4 (the headline size).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_fused_frame.py > /tmp/probe_fused_frame.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_fused_frame.jsonl", "a", buffering=1)


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


def loop(eng, w, h, frames, fused):
    # warm both compiles outside the timed loop
    if fused:
        frame = np.asarray(eng.step_render_frame(width=w, height=h))
    else:
        eng.step()
        frame = np.asarray(eng.render_frame(width=w, height=h))
    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        if fused:
            frame = np.asarray(eng.step_render_frame(width=w, height=h))
        else:
            eng.step()
            frame = np.asarray(eng.render_frame(width=w, height=h))
        times.append(time.perf_counter() - t0)
    ms = sorted(t * 1e3 for t in times)
    return (round(ms[len(ms) // 2], 1), round(ms[int(len(ms) * 0.9)], 1),
            int(frame.max()))


try:
    from gpu_physics_engine_tpu import make_tuned_engine

    N = 1_048_576
    eng = make_tuned_engine(N, seed=0)
    eng.run(64)
    float(eng.state.x[0, 0, 0])
    log(stage="ready", n=N)

    for scale in (4, 2, 1):
        w, h = 1280 // scale, 720 // scale
        for fused in (False, True):
            if time.time() - T0 > 40 * 60:
                log(stage="skip", scale=scale, fused=fused)
                continue
            p50, p90, fmax = loop(eng, w, h, 60, fused)
            log(stage="frame", n=N, scale=scale, w=w, h=h, fused=fused,
                p50_ms=p50, p90_ms=p90, fps=round(1e3 / p50, 1),
                frame_max=fmax)

    # headline size: fused at preview scale 4
    if time.time() - T0 < 42 * 60:
        N4 = 1 << 22
        eng4 = make_tuned_engine(N4, seed=0)
        eng4.run(64)
        float(eng4.state.x[0, 0, 0])
        log(stage="ready", n=N4)
        p50, p90, fmax = loop(eng4, 320, 180, 40, True)
        log(stage="frame", n=N4, scale=4, w=320, h=180, fused=True,
            p50_ms=p50, p90_ms=p90, fps=round(1e3 / p50, 1),
            frame_max=fmax)
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
