"""GS decomposed-vs-flat hardware timing + phase breakdown + render3.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_probe_gs2.py > /tmp/probe_gs2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs2.jsonl", "a", buffering=1)


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
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

# ---- render3: plane-based composite + per-plane MXU resample ----
try:
    from gpu_physics_engine_tpu.render.device import (
        _render_core, autofit_rect)
    cfg = SimConfig(max_particles=4_194_304, initial_particles=4_194_304,
                    pipeline="tiled", tile_cap=6, tile_multiplier=3.3,
                    tiled_match="greedy")
    eng = TiledEngine(cfg, seed=0, chunk=16)
    eng.run(32)
    float(eng.state.x[0, 0, 0])
    rect = jnp.asarray(autofit_rect(cfg, 1280, 720), jnp.float32)

    def frame():
        return _render_core(eng.state.x, eng.state.y, eng.state.px,
                            eng.state.py, eng.state.radius, eng.state.pid,
                            rect, cfg, 1280, 720)
    img = frame()
    f0 = np.asarray(img)
    assert f0.max() > 0 and f0.shape == (720, 1280, 3)
    t0 = time.perf_counter()
    for _ in range(10):
        img = frame()
    _ = int(img[0, 0, 0])
    dev = (time.perf_counter() - t0) / 10 * 1e3
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(frame())
    full = (time.perf_counter() - t0) / 5 * 1e3
    log(stage="render3", device_ms=round(dev, 2), full_ms=round(full, 2),
        frame_max=int(f0.max()))
    del eng
except Exception:
    log(stage="error", where="render3", err=traceback.format_exc()[-400:])


# ---- GS at 1M: flat vs dec, end-to-end + isolated solve ----
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
        gs_solve_pallas_dec, gs_solve_pallas_flat)

    n = 1_048_576
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tiled_solver="gs",
                    tile_multiplier=2.2, tile_cap=5, max_occupancy=6)
    rng = np.random.default_rng(0)
    pos = np.stack([rng.uniform(0.6, cfg.world_width - 0.6, n),
                    rng.uniform(0.6, cfg.world_height - 0.6, n)],
                   -1).astype(np.float32)
    radii = np.full(n, 0.5, np.float32)
    st = tiled_ops.init_tiles(cfg, pos, radii)
    log(stage="gs_init", overflow=float(st.overflow_count))

    flat = jax.jit(lambda s: gs_solve_pallas_flat(s, cfg))
    dec = jax.jit(lambda s: gs_solve_pallas_dec(s, cfg))
    ms_f, out_f = time_call(flat, st)
    log(stage="gs_flat", ms=round(ms_f, 2))
    ms_d, out_d = time_call(dec, st)
    log(stage="gs_dec", ms=round(ms_d, 2))
    same = bool(jnp.array_equal(out_f.x, out_d.x)
                & jnp.array_equal(out_f.y, out_d.y))
    log(stage="gs_parity_hw", one_call_equal="n/a-iterated", chains_equal=same)

    # phase isolation for dec: rank alone via flat's rank (shared kernel)
    # — time a jit that runs ONLY the rank pallas_call
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from gpu_physics_engine_tpu.ops.gs_pallas import (
        BAND, _rank_kernel, _sds)
    t_geo, TY, TX = tiled_ops.tile_geometry(cfg)
    cap = st.dims[0]
    K = cfg.max_occupancy
    pad = (-TY) % BAND
    TYp = TY + pad
    nb = TYp // BAND

    def mid(i):
        return (0, i, 0)

    def spec3(c):
        def up(i):
            return (0, jnp.maximum(i - 1, 0), 0)

        def dn(i):
            return (0, jnp.minimum(i + 1, nb - 1), 0)
        return [pl.BlockSpec((c, BAND, TX), m, memory_space=pltpu.VMEM)
                for m in (up, mid, dn)]

    @jax.jit
    def rank_only(state):
        x = jnp.pad(state.x, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(state.y, ((0, 0), (0, pad), (0, 0)))
        r = jnp.pad(state.radius, ((0, 0), (0, pad), (0, 0)))
        pid = jnp.pad(state.pid, ((0, 0), (0, pad), (0, 0)),
                      constant_values=-1)
        one = jnp.float32(1.0).reshape((1,)) * (state.num_active >= 0)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * (1 << 20))
        src, rpid, rrad, count = pl.pallas_call(
            partial(_rank_kernel, cap=cap, K=K, t=t_geo),
            grid=(nb,),
            in_specs=[smem] + spec3(cap) * 4,
            out_specs=(pl.BlockSpec((K, BAND, TX), mid,
                                    memory_space=pltpu.VMEM),) * 3 + (
                pl.BlockSpec((BAND, TX), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),),
            out_shape=(_sds((K, TYp, TX), jnp.int32),
                       _sds((K, TYp, TX), jnp.int32),
                       _sds((K, TYp, TX), jnp.float32),
                       _sds((TYp, TX), jnp.int32)),
            compiler_params=vmem,
        )(one, x, x, x, y, y, y, r, r, r, pid, pid, pid)
        return src

    s0 = rank_only(st)
    float(s0[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(8):
        s0 = rank_only(st)
    float(s0[0, 0, 0])
    log(stage="gs_rank_only", ms=round((time.perf_counter() - t0) / 8 * 1e3, 2))
except Exception:
    log(stage="error", where="gs", err=traceback.format_exc()[-400:])

log(stage="done")
