"""Interactive preview-scale on hardware: frame loop vs download size.

The round-3 interactive session (docs/probes_r3/tpu_probe_interactive.jsonl)
measured p50 163.6 ms/frame @1M with render+download every frame —
~135 ms of that is the 2.7 MB 1280x720 image download at the relay's
~20 MB/s.  Viewer.render_engine(preview_scale=s) now composites at
(w/s, h/s) and upscales on the host: s^2 less download.  Measure the
end-to-end frame loop (step + render_frame + host fetch) at scale
1/2/4 to publish the honest remote-interactive curve.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_preview.py > /tmp/probe_preview.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_preview.jsonl", "a", buffering=1)


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

    N = 1_048_576
    eng = make_tuned_engine(N, seed=0)
    eng.run(64)
    float(eng.state.x[0, 0, 0])
    log(stage="ready", n=N)

    for scale in (1, 2, 4):
        w, h = 1280 // scale, 720 // scale
        frame = np.asarray(eng.render_frame(width=w, height=h))  # compile
        assert frame.shape == (h, w, 3)
        times = []
        for i in range(60):
            t0 = time.perf_counter()
            eng.step()
            frame = np.asarray(eng.render_frame(width=w, height=h))
            times.append(time.perf_counter() - t0)
        ms = sorted(t * 1e3 for t in times)
        log(stage="scale", scale=scale, w=w, h=h,
            mb=round(w * h * 3 / 1e6, 2),
            p50_ms=round(ms[len(ms) // 2], 1),
            p90_ms=round(ms[int(len(ms) * 0.9)], 1),
            fps=round(1e3 / ms[len(ms) // 2], 1),
            frame_max=int(frame.max()))
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-500:])
