"""Sharded-GS prototype measurement (CPU virtual mesh + analytics).

Turns PARITY.md's principled sharded-GS exclusion into a measured
verdict (VERDICT r4 next #7):
  (a) bitwise parity of the slab-decomposed 4-color frame vs the
      single-chip gs_solve, on 2/4/8 virtual shards,
  (b) relative wall cost sharded-2 vs single on the same backend
      (XLA:CPU — both run the identical jnp formulation, so the delta
      is the decomposition's own tax: ghost recompute + 4 exchanges),
  (c) the per-frame exchange bill at the PRODUCTION GS geometries
      (1M..4M: the 2.65M-cell grid) and an ICI-time projection for a
      real v5e pod slice (45 GB/s/link nominal, conservative).

  cd /root/repo && python scripts/probe_gs_shard.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # `python scripts/x.py` puts scripts/
                                  # on sys.path, not the repo root

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8 "
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=120 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=3600")

T0 = time.time()
LOG = open("/tmp/probe_gs_shard.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402
from gpu_physics_engine_tpu.ops.gs_tiled import gs_solve  # noqa: E402
from gpu_physics_engine_tpu.parallel import mesh as mesh_lib  # noqa: E402
from gpu_physics_engine_tpu.parallel.gs_shard import (  # noqa: E402
    bytes_per_frame, make_sharded_gs_solve)
from gpu_physics_engine_tpu.parallel.tiled_shard import (  # noqa: E402
    init_sharded_tiles)
from gpu_physics_engine_tpu.utils.cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()
log(stage="init", devices=len(jax.devices()))


def cfg_for(w, h, cap=3, K=4):
    return SimConfig(max_particles=1 << 14, initial_particles=0,
                     world_width=float(w), world_height=float(h),
                     initial_radius=0.5, pipeline="tiled",
                     tiled_solver="gs", tile_multiplier=2.2,
                     tile_cap=cap, max_occupancy=K)


# (a)+(b): parity + relative cost on a mid-size CPU world
cfg = cfg_for(96, 48)
rng = np.random.default_rng(23)
n = 2400
pos = np.stack([rng.uniform(0.8, 95.2, n),
                rng.uniform(0.8, 47.2, n)], -1).astype(np.float32)
rad = np.full(n, 0.5, np.float32)
st = tiled.init_tiles(cfg, pos, rad)

ref_fn = jax.jit(lambda s: gs_solve(s, cfg))
ref = ref_fn(st)
jax.block_until_ready(ref.x)
t0 = time.perf_counter()
for _ in range(5):
    ref = ref_fn(st)
    jax.block_until_ready(ref.x)
single_ms = (time.perf_counter() - t0) / 5 * 1e3
log(stage="single", ms=round(single_ms, 2))


def pid_sorted(s):
    pid = np.asarray(s.pid).ravel()
    live = pid >= 0
    o = np.argsort(pid[live])
    return (pid[live][o], np.asarray(s.x).ravel()[live][o],
            np.asarray(s.y).ravel()[live][o])

rp, rx, ry = pid_sorted(ref)
for shards in (2, 4, 8):
    mesh = mesh_lib.make_mesh(shards)
    sst = init_sharded_tiles(cfg, mesh, pos, rad)
    fn = make_sharded_gs_solve(cfg, mesh)
    out = fn(sst)
    jax.block_until_ready(out.x)
    op, ox, oy = pid_sorted(out)
    bit = (np.array_equal(rp, op) and np.array_equal(rx, ox)
           and np.array_equal(ry, oy))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(sst)
        jax.block_until_ready(out.x)
    ms = (time.perf_counter() - t0) / 5 * 1e3
    log(stage="sharded", shards=shards, bitwise=bool(bit),
        ms=round(ms, 2), vs_single=round(ms / single_ms, 3),
        overflow_match=int(out.overflow_count) == int(ref.overflow_count))

# (c) production-geometry exchange bill + ICI projection.  The GS grid
# is world/(2.2*r0) = constant 2.65M cells for the whole 1M..4M curve.
ICI_GBPS = 45.0   # v5e per-link nominal, one direction — conservative
LAUNCH_US = 1.0   # per-collective launch latency class
for n_p, cap in ((1_048_576, 4), (4_194_304, 6)):
    pcfg = SimConfig(max_particles=n_p, initial_particles=n_p,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=8)
    for shards in (2, 4, 8):
        bill = bytes_per_frame(pcfg, shards)
        ici_us = (bill["total_bytes_per_frame"] / (ICI_GBPS * 1e9) * 1e6
                  + 4 * LAUNCH_US)
        log(stage="bill", n=n_p, cap=cap, shards=shards,
            **{k: bill[k] for k in ("rows_per_shard",
                                    "total_bytes_per_frame",
                                    "exchanges_per_frame")},
            ici_projection_us=round(ici_us, 1))

log(stage="done")
