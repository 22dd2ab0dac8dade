"""Diagnose the small/mid-size deferral growth at full size on the TPU.

512k at mult 6.6 has storage occupancy ~1.75 vs cap 7 (headroom 4x!)
yet its deferred population still grows ~0.4%/window — the 4M
occupancy-ratio story cannot explain it.  Per 480-step window this
probe logs, from the live TileState:
  - deferred population (the quality counter),
  - displaced-storage counts by Chebyshev distance (1 / 2 / 3+),
  - storage-occupancy tail (full and cap-1 tile counts),
  - speed stats incl. the fraction faster than tile_edge/interval
    (the one-hop pull's chase threshold).

Run with the TPU free:
  JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_dilute_diag.py > /tmp/probe_diag.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_diag.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.ops.tiled import tile_geometry  # noqa: E402

WINDOW = 480

# (n, mult, cap, chunk, iv): the two growth regimes
RUNS = [
    (512_000, 6.6, 7, 128, 4),
    (100_000, 22.0, 8, 128, 2),
]

for n, mult, cap, chunk, iv in RUNS:
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match="greedy",
                        tiled_relocate_interval=iv,
                        tiled_uniform_radius=True, tiled_newton=True)
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        t, TY, TX = tile_geometry(cfg)
        chase_v = t / iv

        @jax.jit
        def diag(state):
            occm = state.pid >= 0
            ty_now = jax.lax.broadcasted_iota(jnp.int32, state.x.shape, 1)
            tx_now = jax.lax.broadcasted_iota(jnp.int32, state.x.shape, 2)
            tyw = jnp.clip(jnp.floor(state.y / t).astype(jnp.int32) + 1,
                           1, TY - 2)
            txw = jnp.clip(jnp.floor(state.x / t).astype(jnp.int32) + 1,
                           1, TX - 2)
            d = jnp.maximum(jnp.abs(tyw - ty_now), jnp.abs(txw - tx_now))
            d = jnp.where(occm, d, 0)
            occ_per_tile = jnp.sum(occm, axis=0)
            vx = state.x - state.px
            vy = state.y - state.py
            v = jnp.where(occm, jnp.sqrt(vx * vx + vy * vy), 0.0)
            nact = jnp.maximum(jnp.sum(occm), 1)
            return (jnp.sum(d == 1), jnp.sum(d == 2), jnp.sum(d >= 3),
                    jnp.max(d),
                    jnp.sum(occ_per_tile == cap),
                    jnp.sum(occ_per_tile == cap - 1),
                    jnp.sum(v) / nact, jnp.max(v),
                    jnp.sum(v > chase_v))

        for w in range(12):
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            defer = ((float(eng.state.overflow_count) - of0)
                     / WINDOW / n * 100.0) * iv
            d1, d2, d3, dmax, full, nfull, vmean, vmax, nfast = [
                float(x) for x in diag(eng.state)]
            log(stage="window", n=n, cap=cap, w=w, ms=round(ms, 3),
                defer_pop_pct=round(defer, 3),
                disp1=int(d1), disp2=int(d2), disp3p=int(d3),
                dmax=int(dmax), tiles_full=int(full),
                tiles_capm1=int(nfull), v_mean=round(vmean, 4),
                v_max=round(vmax, 3), n_faster_than_hop=int(nfast))
        del eng
    except Exception:
        log(stage="error", n=n, err=traceback.format_exc()[-400:])

log(stage="done")
