"""32M attempt 3: geometry-shape and VMEM-limit angles.

Attempts 1-2 (tpu_probe_32m.jsonl) failed with three signatures at the
12192x2096 world: cap8 = 6.3 GB scoped HBM temporaries in a relocate
fusion; cap6 (iv4 AND iv2) = same scoped-HBM class; cap5 = the Pallas
relocate-apply kernel wants 121.95M VMEM vs the 116M limit (21 blocks
of (cap, 8, 7392) double-buffered — TX is the lever).

Two remaining angles, one attempt each:
  (a) SQUARER 8x world 6096x4192 (same area/density): TX halves to
      ~3696, halving every per-block VMEM footprint and narrowing the
      fusion, at cap6/iv4;
  (b) original world at cap5 with vmem_limit_bytes raised 116M -> 124M
      (the kernel missed by 5.95M; v5e VMEM is 128M) via the
      GPE_VMEM_LIMIT_MB env knob.

Either success = a 32M row; both failing = the documented negative
with five precise signatures.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_32m_b.py > /tmp/probe_32m_b.log 2>&1 &
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

T0 = time.time()
LOG = open("/tmp/tpu_probe_32m_b.jsonl", "a", buffering=1)


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

n = 1 << 25
ATTEMPTS = [
    dict(name="square_cap6", world=(6096.0, 4192.0),
         extra=dict(tile_cap=6, tiled_relocate_interval=4)),
    dict(name="wide_cap5_vmem124", world=(12192.0, 2096.0),
         vmem_mb=124,
         extra=dict(tile_cap=5, tiled_relocate_interval=4)),
]

for att in ATTEMPTS:
    if time.time() - T0 > 40 * 60:
        log(stage="skip", name=att["name"])
        continue
    os.environ.pop("GPE_VMEM_LIMIT_MB", None)
    if att.get("vmem_mb"):
        os.environ["GPE_VMEM_LIMIT_MB"] = str(att["vmem_mb"])
    try:
        w, h = att["world"]
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        world_width=w, world_height=h,
                        pipeline="tiled", tile_multiplier=3.3,
                        tiled_uniform_radius=True, tiled_newton=True,
                        **att["extra"])
        tb = time.time()
        eng = TiledEngine(cfg, seed=0)
        eng.run(64)
        float(eng.state.x[0, 0, 0])
        log(stage="ready", name=att["name"],
            compile_s=round(time.time() - tb, 1),
            slots=int(eng.state.pid.size))
        for wi in range(3):
            t0 = time.perf_counter()
            eng.run(48)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / 48 * 1e3
            log(stage="window", name=att["name"], w=wi, ms=round(ms, 3),
                pps=round(n / ms * 1e3),
                defer=int(eng.state.overflow_count))
        del eng
        log(stage="success", name=att["name"])
    except Exception:
        log(stage="error", name=att["name"],
            err=traceback.format_exc()[-500:])

log(stage="done")
