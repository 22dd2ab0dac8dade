"""Round-2 probe B: (A) device-render cost split (device compute vs
tunnel download) at 4M; (B) small/mid-size curve re-measure with the
run() remainder-chunk fix (bench-identical: sweep cadence included).

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_probe_r2b.py > /tmp/probe_r2b.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_r2b.jsonl", "a", buffering=1)


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
from gpu_physics_engine_tpu.render.device import (  # noqa: E402
    _render_core, autofit_rect)
import jax.numpy as jnp  # noqa: E402

# ---- A: render split at 4M ----
try:
    cfg = SimConfig(max_particles=4_194_304, initial_particles=4_194_304,
                    pipeline="tiled", tile_cap=6, tile_multiplier=3.3,
                    tiled_match="greedy")
    eng = TiledEngine(cfg, seed=0, chunk=16)
    eng.run(32)
    float(eng.state.x[0, 0, 0])

    for w, h in ((1280, 720), (640, 360)):
        rect = jnp.asarray(autofit_rect(cfg, w, h), jnp.float32)

        def frame():
            return _render_core(eng.state.x, eng.state.y, eng.state.px,
                                eng.state.py, eng.state.radius,
                                eng.state.pid, rect, cfg, w, h)
        img = frame()
        np.asarray(img)  # compile + first download
        # device-only: re-render 10x, fetch ONE scalar (sync without bulk)
        t0 = time.perf_counter()
        for _ in range(10):
            img = frame()
        _ = int(img[0, 0, 0])
        dev_ms = (time.perf_counter() - t0) / 10 * 1e3
        # full: render + full download each time
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(frame())
        full_ms = (time.perf_counter() - t0) / 5 * 1e3
        log(stage="render_split", res=f"{w}x{h}",
            device_ms=round(dev_ms, 2), full_ms=round(full_ms, 2),
            bytes=w * h * 3)
    del eng
except Exception:
    log(stage="error", where="render", err=traceback.format_exc()[-400:])

# ---- B: curve re-measure with remainder chunks (bench-identical) ----
BASELINE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
            1_048_576: 3.66}
GEOM = {
    100_000: (22.0, 8, 128, "greedy"),
    256_000: (12.1, 8, 128, "greedy"),
    512_000: (6.6, 6, 128, "greedy"),
    756_000: (4.4, 4, 32, "greedy"),
    1_048_576: (4.4, 5, 32, "greedy"),
}
SETTLE, WINDOW = 400, 480
for n, (mult, cap, chunk, match) in GEOM.items():
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match=match)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        settle = SETTLE - SETTLE % chunk
        eng.run(settle)
        of0 = float(eng.state.overflow_count)
        t0 = time.perf_counter()
        eng.run(WINDOW)
        float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / WINDOW * 1e3
        defer = (float(eng.state.overflow_count) - of0) / WINDOW / n * 100
        log(stage="curve_fixed", n=n, mult=mult, cap=cap, chunk=chunk,
            ms_per_step=round(ms, 3), defer_pct=round(defer, 3),
            vs_baseline=round(BASELINE[n] / ms, 3))
        del eng
    except Exception:
        log(stage="error", where=f"curve_{n}",
            err=traceback.format_exc()[-400:])

log(stage="done")
