"""GS parity phase profile v2 — scalar fetches only (the v1 loops
fetched a 13 MB plane per timing, ~0.7 s of tunnel download that
swamped the numbers; render probes measured the tunnel at ~20 MB/s).

Each phase is scanned ITER deep inside ONE program and reduced to a
scalar in-graph.  Also times the composed step (should reproduce the
curve's ~11 ms) and the to/from-parity conversion.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_phase2.py > /tmp/probe_gs_phase2.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_phase2.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

import numpy as np  # noqa: E402

from gpu_physics_engine_tpu import SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.state import StepParams  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

try:
    from gpu_physics_engine_tpu.ops.gs_parity import (
        gs_parity_step_fn, integrate_parity, rank_parity, relocate_parity,
        solve_parity, to_parity, from_parity)
    from gpu_physics_engine_tpu.ops.tiled import tile_geometry

    # --- stage 0: r-plane-drop xcheck on hardware (the round-3
    # uniform layout carries no radius sub-grids; gs_parity._flds).
    # 64k, 8 steps: uniform-vs-general pids identical, dx=dy=0
    # (tpu_probe_gsuni.jsonl showed the uniform math is bit-exact on
    # the VPU), radius planes identical (pure reconstruction).
    outs = {}
    for uni in (False, True):
        c0 = SimConfig(max_particles=65_536, initial_particles=65_536,
                       pipeline="tiled", tiled_solver="gs",
                       tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                       tiled_uniform_radius=uni)
        e0 = TiledEngine(c0, seed=0, chunk=8)
        e0.run(8)
        s = e0.state
        pid = np.asarray(s.pid).ravel()
        order = np.argsort(pid)
        outs[uni] = (pid[order], np.asarray(s.x).ravel()[order],
                     np.asarray(s.y).ravel()[order],
                     np.asarray(s.radius).ravel()[order],
                     int(s.overflow_count))
        del e0
    same_pids = bool((outs[True][0] == outs[False][0]).all())
    dx = float(np.abs(outs[True][1] - outs[False][1]).max())
    dy = float(np.abs(outs[True][2] - outs[False][2]).max())
    dr = float(np.abs(outs[True][3] - outs[False][3]).max())
    ok = same_pids and dx == 0.0 and dy == 0.0 and dr == 0.0
    log(stage="rdrop_xcheck", same_pids=same_pids, dx=dx, dy=dy, dr=dr,
        overflow=(outs[True][4], outs[False][4]), ok=ok)
    if not ok:
        raise RuntimeError("r-drop xcheck failed; skipping phases")

    N = 1_048_576
    cfg = SimConfig(max_particles=N, initial_particles=N,
                    pipeline="tiled", tiled_solver="gs",
                    tile_multiplier=2.2, tile_cap=5, max_occupancy=6,
                    tiled_uniform_radius=True)
    eng = TiledEngine(cfg, seed=0, chunk=32)
    eng.run(96)
    float(eng.state.x[0, 0, 0])
    t, TY, TX = tile_geometry(cfg)
    cap, K = eng.state.dims[0], cfg.max_occupancy
    subs, num_active, overflow = to_parity(eng.state, cfg)
    params = StepParams.make(cfg.dt)
    ITER = 32

    def timed(name, fn):
        f = jax.jit(fn)
        _ = float(f(subs, jnp.int32(0)))   # compile
        t0 = time.perf_counter()
        _ = float(f(subs, jnp.int32(0)))
        ms = (time.perf_counter() - t0) / ITER * 1e3
        log(stage="phase", name=name, ms=round(ms, 3))

    def _chk(s):
        return s["x"][(0, 0)][0, 0, 0] + s["x"][(1, 1)][0, 0, 0]

    def rank_loop(s0, acc):
        def body(a, _):
            one = jnp.where(a >= 0, jnp.float32(1.0),
                            jnp.float32(2.0)).reshape((1,))
            tables, ovf = rank_parity(s0, one, cfg, cap, K, t, TY, TX)
            a = a + ovf + tables[(0, 0)][0][0, 0, 0]
            return a, None
        return jax.lax.scan(body, acc, None, length=ITER)[0].astype(
            jnp.float32)

    def solve_loop(s0, acc):
        def body(s, _):
            one = jnp.where(s["pid"][(0, 0)][0, 0, 0] != -12345,
                            jnp.float32(1.0), jnp.float32(2.0)
                            ).reshape((1,))
            s2, _ovf = solve_parity(s, one, cfg, cap, K, t, TY, TX)
            return s2, None
        return _chk(jax.lax.scan(body, s0, None, length=ITER)[0])

    def reloc_loop(s0, acc):
        def body(s, _):
            s2, _d = relocate_parity(s, cfg, cap, t, TY, TX)
            return s2, None
        return _chk(jax.lax.scan(body, s0, None, length=ITER)[0])

    def integ_loop(s0, acc):
        def body(s, _):
            return integrate_parity(s, params, cfg, 1.0), None
        return _chk(jax.lax.scan(body, s0, None, length=ITER)[0])

    def step_loop(s0, acc):
        def body(c, _):
            return gs_parity_step_fn(c, params, cfg), None
        c = (s0, num_active, jnp.int32(0))
        return _chk(jax.lax.scan(body, c, None, length=ITER)[0][0])

    timed("step", step_loop)
    timed("rank", rank_loop)
    timed("solve_rank_4colors", solve_loop)
    timed("relocate", reloc_loop)
    timed("integrate", integ_loop)

    # conversion cost: ITER round trips full<->parity
    def conv_loop(s0, acc):
        def body(st, _):
            sb, na, of = to_parity(st, cfg)
            return from_parity((sb, na, of), st, cfg), None
        return jax.lax.scan(body, eng.state, None,
                            length=ITER)[0].x[0, 0, 0]

    f = jax.jit(conv_loop)
    _ = float(f(subs, jnp.int32(0)))
    t0 = time.perf_counter()
    _ = float(f(subs, jnp.int32(0)))
    log(stage="phase", name="convert_roundtrip",
        ms=round((time.perf_counter() - t0) / ITER * 1e3, 3))

    # cap=4 engine re-measure in THIS fresh process: the curve probe saw
    # 333 ms/step after ~25 min of heavy prior use — degraded runtime or
    # real Mosaic pathology?
    del subs, eng
    for cap_ in (4, 5):
        cfg2 = SimConfig(max_particles=N, initial_particles=N,
                         pipeline="tiled", tiled_solver="gs",
                         tile_multiplier=2.2, tile_cap=cap_,
                         max_occupancy=6, tiled_uniform_radius=True)
        eng2 = TiledEngine(cfg2, seed=0, chunk=32)
        eng2.run(96)
        float(eng2.state.x[0, 0, 0])
        t0 = time.perf_counter()
        eng2.run(192)
        float(eng2.state.x[0, 0, 0])
        log(stage="cap_recheck", cap=cap_,
            ms=round((time.perf_counter() - t0) / 192 * 1e3, 3))
        del eng2
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-600:])
