"""GS reference-semantics curve + phase profile (VERDICT r2 item 1).

Stages (one JSONL line each, /tmp/tpu_probe_gs_curve.jsonl):
  1. curve   — gs_layout auto (par+fused+uniform) engine ms/step at all
               8 reference sizes.  The GS grid is constant (world /
               (2.2 x r0) cells regardless of n), so this measures how
               flat the cost really is.
  2. occ     — storage-occupancy histogram per size (is cap=5 needed?)
  3. phase   — @1M: rank / solve(rank+4 colors) / relocate / integrate
               each scanned inside ONE program (tunnel dispatch floor
               ~3.6-5.7 ms must be amortized), fetch-synced.
  4. capk    — bit-xcheck at 256k: does (cap=4, K=5/4) change any bit
               vs (cap=5, K=6) over 8 steps?  If not, the narrowed
               tables are semantics-preserving for the BASELINE scenes
               and buy op count + traffic.  Then 1M timings.

Run with the TPU free (one TPU process at a time):
  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_gs_curve.py > /tmp/probe_gs_curve.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gs_curve.jsonl", "a", buffering=1)


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
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402

SIZES = [100_000, 256_000, 512_000, 756_000, 1_048_576,
         2_000_000, 3_000_000, 4_194_304]
BASE = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
        1_048_576: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
        4_194_304: 22.70}


def gs_cfg(n, cap=5, K=6, **kw):
    return SimConfig(max_particles=n, initial_particles=n,
                     pipeline="tiled", tiled_solver="gs",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=K,
                     tiled_uniform_radius=True, **kw)


# --- stage 1+2: curve + occupancy ----------------------------------------
SETTLE, WINDOW = 96, 192
for n in SIZES:
    try:
        eng = TiledEngine(gs_cfg(n), seed=0, chunk=32)
        of0 = float(eng.state.overflow_count)
        eng.run(SETTLE)
        float(eng.state.x[0, 0, 0])
        of1 = float(eng.state.overflow_count)
        ms = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
        of2 = float(eng.state.overflow_count)
        occ = (np.asarray(eng.state.pid) >= 0).sum(0)
        hist = np.bincount(occ.ravel(), minlength=6)
        log(stage="curve", n=n, ms=round(ms, 3),
            vs_baseline=round(BASE[n] / ms, 3),
            overflow_settle=of1 - of0,
            overflow_per_step=round((of2 - of1) / (2 * WINDOW), 2),
            occ_hist=[int(x) for x in hist], occ_max=int(occ.max()))
        if n == 1_048_576:
            eng_1m = eng
        else:
            del eng
    except Exception:
        log(stage="error", where=f"curve{n}",
            err=traceback.format_exc()[-500:])

# --- stage 3: phase profile @1M -------------------------------------------
try:
    from gpu_physics_engine_tpu.ops.gs_parity import (
        integrate_parity, rank_parity, relocate_parity, solve_parity,
        to_parity)
    from gpu_physics_engine_tpu.ops.tiled import tile_geometry

    cfg = eng_1m.config
    t, TY, TX = tile_geometry(cfg)
    cap, K = eng_1m.state.dims[0], cfg.max_occupancy
    subs, num_active, overflow = to_parity(eng_1m.state, cfg)
    ITER = 24

    def timed(name, fn, carry):
        f = jax.jit(fn)
        out = f(carry)   # compile + settle
        out = jax.tree.leaves(out)[0]
        _ = float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        out = f(carry)
        out = jax.tree.leaves(out)[0]
        _ = float(np.asarray(out).ravel()[0])
        ms = (time.perf_counter() - t0) / ITER * 1e3
        log(stage="phase", name=name, ms=round(ms, 3))

    def rank_loop(c):
        subs_, acc = c
        def body(a, _):
            one = jnp.where(a >= 0, jnp.float32(1.0),
                            jnp.float32(2.0)).reshape((1,))
            tables, ovf = rank_parity(subs_, one, cfg, cap, K, t, TY, TX)
            a = a + ovf + tables[(0, 0)][0][0, 0, 0]
            return a, None
        return jax.lax.scan(body, acc, None, length=ITER)[0]

    def solve_loop(c):
        subs_, acc = c
        def body(s, _):
            one = jnp.where(acc >= 0, jnp.float32(1.0),
                            jnp.float32(2.0)).reshape((1,))
            s2, ovf = solve_parity(s, one, cfg, cap, K, t, TY, TX)
            return s2, None
        return jax.lax.scan(body, subs_, None, length=ITER)[0]["x"][(0, 0)]

    def reloc_loop(c):
        subs_, acc = c
        def body(s, _):
            s2, d = relocate_parity(s, cfg, cap, t, TY, TX)
            return s2, None
        return jax.lax.scan(body, subs_, None, length=ITER)[0]["x"][(0, 0)]

    def integ_loop(c):
        subs_, acc = c
        from gpu_physics_engine_tpu.core.state import StepParams
        p = StepParams.make(cfg.dt)
        def body(s, _):
            return integrate_parity(s, p, cfg, 1.0), None
        return jax.lax.scan(body, subs_, None, length=ITER)[0]["x"][(0, 0)]

    carry = (subs, jnp.int32(0))
    timed("rank", rank_loop, carry)
    timed("solve_rank_4colors", solve_loop, carry)
    timed("relocate", reloc_loop, carry)
    timed("integrate", integ_loop, carry)
    del eng_1m, subs, carry
except Exception:
    log(stage="error", where="phase", err=traceback.format_exc()[-500:])

# --- stage 4: cap/K narrowing ---------------------------------------------
try:
    outs = {}
    for (cap_, K_) in ((5, 6), (5, 5), (4, 6), (4, 4)):
        eng = TiledEngine(gs_cfg(256_000, cap=cap_, K=K_), seed=0, chunk=8)
        eng.run(8)
        s = eng.state
        pid = np.asarray(s.pid).ravel()
        m = pid >= 0
        order = np.argsort(pid[m])
        outs[(cap_, K_)] = (pid[m][order],
                            np.asarray(s.x).ravel()[m][order],
                            np.asarray(s.y).ravel()[m][order],
                            int(s.overflow_count))
        del eng
    ref = outs[(5, 6)]
    for k, v in outs.items():
        if k == (5, 6):
            continue
        same = (len(ref[0]) == len(v[0])
                and bool((ref[0] == v[0]).all()))
        dx = float(np.abs(ref[1] - v[1]).max()) if same else -1.0
        dy = float(np.abs(ref[2] - v[2]).max()) if same else -1.0
        log(stage="capk_xcheck", cap=k[0], K=k[1], same_pids=same,
            dx=dx, dy=dy, overflow=v[3], ref_overflow=ref[3])

    for (cap_, K_) in ((4, 6), (4, 5), (4, 4)):
        eng = TiledEngine(gs_cfg(1_048_576, cap=cap_, K=K_), seed=0,
                          chunk=32)
        eng.run(SETTLE)
        float(eng.state.x[0, 0, 0])
        t0 = time.perf_counter()
        eng.run(WINDOW)
        float(eng.state.x[0, 0, 0])
        ms = (time.perf_counter() - t0) / WINDOW * 1e3
        log(stage="capk_time", cap=cap_, K=K_, n=1_048_576,
            ms=round(ms, 3))
        del eng
except Exception:
    log(stage="error", where="capk", err=traceback.format_exc()[-500:])

log(stage="done")
