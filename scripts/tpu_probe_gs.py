"""GS solver on REAL TPU: compiled-path correctness + phase timing.

Sweep v6's end-to-end GS run at 1M showed 61 ms/step with an absurd
overflow count (42.8M) — either the compiled Mosaic lowering of the rank
kernel diverges from interpret mode (roll/view semantics), or the claim
relocate dominates, or the overflow metric itself misbehaves at the
2.6M-tile geometry.  This probe separates the questions:

  A. small scene: gs_solve_pallas COMPILED on TPU vs the numpy scalar
     model — the same comparison the CPU interpret tests make bitwise.
  B. 1M: time jit(gs_solve_pallas) alone, the claim relocate alone, and
     report the single-call overflow count.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_probe_gs.py > /tmp/probe_gs.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs.jsonl", "a", buffering=1)


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

import sys  # noqa: E402
sys.path.insert(0, "/root/repo/tests")
import reference_model as model  # noqa: E402
from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402
from gpu_physics_engine_tpu.ops.gs_pallas import gs_solve_pallas  # noqa: E402

# ---- A. compiled correctness on a small scene ----
try:
    rng = np.random.default_rng(0)
    n = 220
    w, h = 32.0, 16.0
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    radii = rng.uniform(0.3, 0.5, n).astype(np.float32)
    radii[0] = 0.5
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=w, world_height=h, initial_radius=0.5,
                    pipeline="tiled", tiled_solver="gs",
                    tile_multiplier=2.2, tile_cap=8, max_occupancy=6,
                    sort_interval_steps=0)
    st = tiled.init_tiles(cfg, pos, radii)
    out = jax.jit(lambda s: gs_solve_pallas(s, cfg))(st)
    pid, p, _, _ = tiled.export_particles(out)
    got = p[np.argsort(pid)]

    cells, objs = model.build_cell_ids(pos, radii, 1.1)
    sc, so = model.sort_map(cells, objs)
    want = model.solve_colored(pos, radii, sc, so, stiffness=0.6,
                               max_occupancy=6).astype(np.float32)
    bad = np.nonzero(np.any(got != want, axis=1))[0]
    log(stage="A_correctness", mismatches=int(len(bad)),
        max_abs_diff=float(np.abs(got - want).max()),
        overflow=float(out.overflow_count))
except Exception as e:
    log(stage="A_error", err=f"{type(e).__name__}: {e}"[:300],
        tb=traceback.format_exc()[-600:])

# ---- B. 1M phase timing ----
try:
    n = 1_000_000
    cfg1 = SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                     sort_interval_steps=0)
    rng = np.random.default_rng(0)
    pos = np.stack([rng.uniform(0.0, cfg1.world_width, n),
                    rng.uniform(0.0, cfg1.world_height, n)],
                   -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    t_build = time.time()
    st = tiled.init_tiles(cfg1, pos, radii)
    log(stage="B_init", build_s=round(time.time() - t_build, 1),
        init_overflow=float(st.overflow_count))

    def timeit(name, fn, arg):
        f = jax.jit(fn)
        out = f(arg)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0].astype(np.float32) * 0 + 1)  # sync
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(arg)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0].astype(np.float32) * 0 + 1)
        ms = (time.perf_counter() - t0) / 5 * 1e3
        log(stage="B_time", phase=name, ms=round(ms, 2))
        return out

    out = timeit("gs_solve_pallas", lambda s: gs_solve_pallas(s, cfg1), st)
    log(stage="B_overflow_per_call",
        overflow=float(out.overflow_count) - float(st.overflow_count))
    timeit("claim_relocate", lambda s: tiled.relocate(s, cfg1), st)
except Exception as e:
    log(stage="B_error", err=f"{type(e).__name__}: {e}"[:300],
        tb=traceback.format_exc()[-600:])

log(stage="done")
