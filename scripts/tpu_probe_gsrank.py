"""GS rank-v2 ("net" pid-key selection network) hardware timing @1M.

Measures, at the 1M GS geometry (tile 2.2 / cap 5 / K 6):
  - rank-only: minloop vs net (the kernel this round targets)
  - full flat GS solve: minloop vs net (chained, fetch-synced)
  - full mx GS solve with net rank (the combined round-2 endpoint)
  - hardware chain parity: net vs minloop must stay bit-identical

Run AFTER the round-2 runbook finishes (one TPU process at a time):
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gsrank.py > /tmp/probe_gsrank.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gsrank.jsonl", "a", buffering=1)


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
import jax.numpy as jnp  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402


def time_call(fn, state, iters=8):
    out = fn(state)
    float(out.x[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out)
    float(out.x[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3, out


try:
    from gpu_physics_engine_tpu.ops import tiled as tiled_ops
    from gpu_physics_engine_tpu.ops.gs_pallas import (
        _rank_full, gs_solve_pallas_flat, gs_solve_pallas_mx)

    n = 1_048_576
    cfgs = {rank: SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tiled_solver="gs",
                            tile_multiplier=2.2, tile_cap=5,
                            max_occupancy=6, gs_rank=rank)
            for rank in ("minloop", "net")}
    cfg0 = cfgs["minloop"]
    rng = np.random.default_rng(0)
    pos = np.stack([rng.uniform(0.6, cfg0.world_width - 0.6, n),
                    rng.uniform(0.6, cfg0.world_height - 0.6, n)],
                   -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    st = tiled_ops.init_tiles(cfg0, pos, radii)
    t = tiled_ops.tile_geometry(cfg0)[0]
    log(stage="gs_init", overflow=float(st.overflow_count))

    # ---- rank-only: pipelined dispatch, one fetch ----
    one = jnp.float32(1.0).reshape((1,))
    for rank, cfg in cfgs.items():
        fn = jax.jit(lambda s, o, c=cfg: _rank_full(
            c, o, s.x, s.y, s.radius, s.pid, 5, 6, t)[3])
        src = fn(st, one)
        float(src[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(8):
            src = fn(st, one)
        float(src[0, 0, 0])
        log(stage="rank_only", impl=rank,
            ms=round((time.perf_counter() - t0) / 8 * 1e3, 2))

    # ---- full flat GS chains + hardware parity ----
    outs = {}
    for rank, cfg in cfgs.items():
        fn = jax.jit(lambda s, c=cfg: gs_solve_pallas_flat(s, c))
        ms, outs[rank] = time_call(fn, st)
        log(stage="gs_flat", impl=rank, ms=round(ms, 2))
    same = bool(jnp.array_equal(outs["minloop"].x, outs["net"].x)
                & jnp.array_equal(outs["minloop"].y, outs["net"].y))
    log(stage="rank_parity_hw", chains_equal=same,
        overflow_equal=bool(outs["minloop"].overflow_count
                            == outs["net"].overflow_count))

    # ---- mx layout with net rank: the combined endpoint ----
    fn = jax.jit(lambda s: gs_solve_pallas_mx(s, cfgs["net"]))
    ms, out_mx = time_call(fn, st)
    same = bool(jnp.array_equal(outs["minloop"].x, out_mx.x)
                & jnp.array_equal(outs["minloop"].y, out_mx.y))
    log(stage="gs_mx_net", ms=round(ms, 2), chains_equal=same)

    # ---- K=5: rank/solve/apply all scale ~linearly with K, and K=6's
    # measured GS deferral was 0.004%/step — how much quality does the
    # ~17% cheaper table cost?  (overflow delta = the quality signal)
    cfg5 = cfgs["net"].replace(max_occupancy=5)
    fn5 = jax.jit(lambda s: gs_solve_pallas_mx(s, cfg5))
    of0 = float(st.overflow_count)
    ms5, out5 = time_call(fn5, st)
    log(stage="gs_mx_net_K5", ms=round(ms5, 2),
        overflow_delta_per_call=round(
            (float(out5.overflow_count) - of0) / 9.0, 1))
except Exception:
    log(stage="error", where="gsrank", err=traceback.format_exc()[-400:])

log(stage="done")
