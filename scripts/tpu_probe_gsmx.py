"""GS mx-layout hardware timing: flat vs mx @1M (solve chains + engine
end-to-end), plus relayout-only isolation.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_probe_gsmx.py > /tmp/probe_gsmx.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_gsmx.jsonl", "a", buffering=1)


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
        _mx_blocks, _mx_decompose, _mx_onehot, _mx_recompose,
        gs_solve_pallas_flat, gs_solve_pallas_mx)

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
    mx = jax.jit(lambda s: gs_solve_pallas_mx(s, cfg))
    ms_f, out_f = time_call(flat, st)
    log(stage="gs_flat", ms=round(ms_f, 2))
    ms_m, out_m = time_call(mx, st)
    log(stage="gs_mx", ms=round(ms_m, 2))
    same = bool(jnp.array_equal(out_f.x, out_m.x)
                & jnp.array_equal(out_f.y, out_m.y))
    log(stage="gs_parity_hw", chains_equal=same,
        overflow_equal=bool(out_f.overflow_count == out_m.overflow_count))

    # raw-f32 relayout (gs_mx_split=False): timing + chain equality vs
    # the split path (equal iff the raw one-hot matmul is bit-exact here)
    cfg_ns = cfg.replace(gs_mx_split=False)
    mx_ns = jax.jit(lambda s: gs_solve_pallas_mx(s, cfg_ns))
    ms_ns, out_ns = time_call(mx_ns, st)
    same_ns = bool(jnp.array_equal(out_f.x, out_ns.x)
                   & jnp.array_equal(out_f.y, out_ns.y))
    log(stage="gs_mx_nosplit", ms=round(ms_ns, 2), chains_equal=same_ns)

    # relayout-only isolation: decompose+recompose round trip of the
    # solve's plane set (x, y, pid at cap + src-class K*3), fetch-synced
    _, TY, TX = tiled_ops.tile_geometry(cfg)

    @jax.jit
    def relayout_only(s):
        by, bx = _mx_blocks(TY, TX)
        Ey, Ex = _mx_onehot(by), _mx_onehot(bx)
        xs = _mx_decompose(s.x, TY, TX, 0.0, Ey, Ex)
        ys = _mx_decompose(s.y, TY, TX, 0.0, Ey, Ex)
        ps = _mx_decompose(s.pid, TY, TX, -1, Ey, Ex)
        nx = _mx_recompose(xs, TY, TX, jnp.float32, Ey, Ex)
        ny = _mx_recompose(ys, TY, TX, jnp.float32, Ey, Ex)
        return nx[0, 0, 0] + ny[0, 0, 0] + ps[(0, 0)][0, 0, 0]
    float(relayout_only(st))
    t0 = time.perf_counter()
    for _ in range(8):
        v = relayout_only(st)
    float(v)
    log(stage="relayout_xypid_roundtrip",
        ms=round((time.perf_counter() - t0) / 8 * 1e3, 2))

    # is a RAW f32 one-hot matmul (no u16 split) bit-exact on this
    # hardware?  If yes the split can be dropped (halves relayout cost).
    from gpu_physics_engine_tpu.ops.gs_pallas import _mx_onehot

    def cols_split_raw(x, E, prec):
        C, R, L = x.shape
        b = x.reshape(C, R, L // 256, 256)
        o = jnp.einsum("crbk,kh->crbh", b, E, precision=prec)
        return (o[..., :128].reshape(C, R, L // 2),
                o[..., 128:].reshape(C, R, L // 2))

    rng2 = np.random.default_rng(1)
    a = (rng2.standard_normal((2, 256, 512)).astype(np.float32)
         * np.exp(rng2.uniform(-30, 30, (2, 256, 512))).astype(np.float32))
    E = _mx_onehot(256)
    for prec_name in ("HIGHEST", "DEFAULT"):
        prec = getattr(jax.lax.Precision, prec_name)
        ev, od = jax.jit(
            lambda x, p=prec: cols_split_raw(x, E, p))(jnp.asarray(a))
        ok = (np.array_equal(np.asarray(ev).view(np.uint32),
                             a[..., 0::2].view(np.uint32))
              and np.array_equal(np.asarray(od).view(np.uint32),
                                 a[..., 1::2].view(np.uint32)))
        log(stage="raw_f32_onehot_exact", precision=prec_name, exact=ok)
except Exception:
    log(stage="error", where="gs_mx", err=traceback.format_exc()[-400:])

# ---- engine end-to-end with gs_layout=mx vs flat ----
try:
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine

    for layout in ("flat", "mx"):
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tiled_solver="gs",
                        gs_layout=layout, tile_multiplier=2.2,
                        tile_cap=5, max_occupancy=6)
        eng = TiledEngine(cfg, seed=0, chunk=8)
        eng.run(16)
        float(eng.state.x[0, 0, 0])
        t0 = time.perf_counter()
        eng.run(64)
        float(eng.state.x[0, 0, 0])
        log(stage=f"gs_engine_{layout}",
            ms_per_step=round((time.perf_counter() - t0) / 64 * 1e3, 2),
            overflow=float(eng.state.overflow_count))
        del eng
except Exception:
    log(stage="error", where="gs_engine", err=traceback.format_exc()[-400:])

log(stage="done")
