"""Round-2 probe C: (A) device-render stage bisect at the 4M geometry —
the jitted frame measures ~97 ms on hardware where first-principles say
~2 ms; find the stage.  (B) phase split at the mid-curve geometries
(512k/756k/1M): relocate vs fused collide+integrate, scanned in-program
so the tunnel's ~5.7 ms/program floor divides out.

Run: JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
     nohup python scripts/tpu_probe_r2c.py > /tmp/probe_r2c.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_r2c.jsonl", "a", buffering=1)


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
import numpy as np  # noqa: E402
from functools import partial  # noqa: E402

from gpu_physics_engine_tpu import SimConfig, StepParams  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402
from gpu_physics_engine_tpu.render import device as rdev  # noqa: E402
from gpu_physics_engine_tpu.ops import tiled  # noqa: E402

REPS = 16


def timeit(fn, *args):
    """Median-of-3 of a fetch-synced REPS-iteration window, ms/iter."""
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # compile + sync
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best.append((time.perf_counter() - t0) * 1e3)
    return sorted(best)[1]


# ---- A: render stage bisect at the 4M production geometry ----
try:
    cfg = SimConfig(max_particles=4_194_304, initial_particles=4_194_304,
                    pipeline="tiled", tile_cap=6, tile_multiplier=3.3,
                    tiled_match="greedy")
    eng = TiledEngine(cfg, seed=0, chunk=16)
    eng.run(32)
    float(eng.state.x[0, 0, 0])
    st = eng.state
    W, H = 1280, 720
    rect0 = np.asarray(rdev.autofit_rect(cfg, W, H), np.float32)
    rects = jnp.asarray(rect0[None, :].repeat(REPS, 0))
    rects = rects + jnp.arange(REPS, dtype=jnp.float32)[:, None] * 1e-3

    t, TY, TX = tiled.tile_geometry(cfg)

    def composite(x, y, px, py, radius, pid):
        tf = jnp.float32(t)
        ty = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        tx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        cx = (tx.astype(jnp.float32) - 0.5) * tf
        cy = (ty.astype(jnp.float32) - 0.5) * tf
        occ = pid >= 0
        dx = x - cx
        dy = y - cy
        r2 = jnp.maximum(4.0 * radius * radius, 1e-8)
        alpha = 1.0 - rdev._smoothstep(0.2304, 0.25, (dx * dx + dy * dy) / r2)
        alpha = jnp.where(occ, alpha, 0.0)
        best = jnp.argmax(alpha, axis=0)
        amax = jnp.max(alpha, axis=0)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
                  == best[None])
        take = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=0)
        return [c * amax for c in
                rdev._velocity_rgb(take(x - px), take(y - py))]

    def resample_stage(planes, rect):
        x0, y0, x1, y1 = rect[0], rect[1], rect[2], rect[3]
        tf = jnp.float32(t)
        col_centers = (jnp.arange(TX, dtype=jnp.float32) - 0.5) * tf
        row_centers = (jnp.arange(TY, dtype=jnp.float32) - 0.5) * tf
        bf = jnp.bfloat16
        wxT = rdev._bilinear_weights(W, x0, x1, col_centers).T.astype(bf)
        wy = rdev._bilinear_weights(H, y0, y1, row_centers).astype(bf)

        def resample(p):
            o = jax.lax.dot(p.astype(bf), wxT,
                            preferred_element_type=jnp.float32)
            return jax.lax.dot(wy, o.astype(bf),
                               preferred_element_type=jnp.float32)
        return [resample(p) for p in planes]

    @jax.jit
    def s1_composite(st_x, st_y, st_px, st_py, st_r, st_pid, rects):
        def body(c, rect):
            planes = composite(st_x + rect[0] * 0.0, st_y, st_px, st_py,
                               st_r, st_pid)
            return c + planes[0][0, 0] + planes[1][0, 0], None
        return jax.lax.scan(body, jnp.float32(0), rects)[0]

    @jax.jit
    def s2_full_f32(st_x, st_y, st_px, st_py, st_r, st_pid, rects):
        def body(c, rect):
            # rect dependency keeps the composite inside the scan (XLA
            # would otherwise hoist the loop-invariant stage out and the
            # window would time resample only)
            planes = composite(st_x + rect[0] * 0.0, st_y, st_px, st_py,
                               st_r, st_pid)
            outs = resample_stage(planes, rect)
            return c + outs[0][0, 0] + outs[1][0, 0], None
        return jax.lax.scan(body, jnp.float32(0), rects)[0]

    @jax.jit
    def s3_uint8(st_x, st_y, st_px, st_py, st_r, st_pid, rects):
        def body(c, rect):
            planes = composite(st_x + rect[0] * 0.0, st_y, st_px, st_py,
                               st_r, st_pid)
            outs = resample_stage(planes, rect)
            out = jnp.stack(outs, axis=-1)[::-1]
            img = (jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
            return c + img[0, 0, 0].astype(jnp.int32), None
        return jax.lax.scan(body, jnp.int32(0), rects)[0]

    @jax.jit
    def s4_resample_only(planes, rects):
        def body(c, rect):
            outs = resample_stage(planes, rect)
            return c + outs[0][0, 0] + outs[1][0, 0], None
        return jax.lax.scan(body, jnp.float32(0), rects)[0]

    args = (st.x, st.y, st.px, st.py, st.radius, st.pid, rects)
    ms = timeit(s1_composite, *args)
    log(stage="render_bisect", part="composite", ms_per_frame=round(ms / REPS, 3),
        window_ms=round(ms, 1))
    ms = timeit(s2_full_f32, *args)
    log(stage="render_bisect", part="composite+resample",
        ms_per_frame=round(ms / REPS, 3), window_ms=round(ms, 1))
    ms = timeit(s3_uint8, *args)
    log(stage="render_bisect", part="full_uint8",
        ms_per_frame=round(ms / REPS, 3), window_ms=round(ms, 1))
    planes0 = jax.jit(lambda *a: composite(*a))(*args[:6])
    ms = timeit(s4_resample_only, planes0, rects)
    log(stage="render_bisect", part="resample_only",
        ms_per_frame=round(ms / REPS, 3), window_ms=round(ms, 1))

    # single-dispatch (non-scanned) jitted frame for comparison with the
    # r2b probe numbers: per-frame dispatch floor included
    t0 = time.perf_counter()
    for i in range(10):
        img = rdev._render_core(st.x, st.y, st.px, st.py, st.radius,
                                st.pid, jnp.asarray(rect0), cfg, W, H)
    v = int(img[0, 0, 0])
    log(stage="render_bisect", part="dispatch_path_10x",
        ms_per_frame=round((time.perf_counter() - t0) / 10 * 1e3, 2), v=v)
    del eng
except Exception:
    log(stage="error", where="render", err=traceback.format_exc()[-600:])

# ---- B: phase split at mid-curve geometries ----
GEOM = {
    512_000: (6.6, 6, "greedy"),
    756_000: (4.4, 4, "greedy"),
    1_048_576: (4.4, 5, "greedy"),
    4_194_304: (3.3, 6, "greedy"),
}
from gpu_physics_engine_tpu.ops.tiled_pallas import (  # noqa: E402
    collide_integrate_pallas, relocate_pallas)

for n, (mult, cap, match) in GEOM.items():
    try:
        cfg = SimConfig(max_particles=n, initial_particles=n,
                        pipeline="tiled", tile_cap=cap,
                        tile_multiplier=mult, tiled_match=match)
        eng = TiledEngine(cfg, seed=0, chunk=32)
        eng.run(224)  # settle a bit (full settle not needed for a split)
        float(eng.state.x[0, 0, 0])
        st = eng.state
        params = StepParams.make(cfg.dt)
        K = 32

        @jax.jit
        def reloc_only(state):
            def body(s, _):
                return relocate_pallas(s, cfg), None
            return jax.lax.scan(body, state, None, length=K)[0]

        @jax.jit
        def collide_only(state):
            def body(s, _):
                return collide_integrate_pallas(s, params, cfg,
                                                dt_scale=1.0), None
            return jax.lax.scan(body, state, None, length=K)[0]

        def run_phase(fn, state):
            out = fn(state)
            float(out.x[0, 0, 0])
            best = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(state)
                float(out.x[0, 0, 0])
                best.append((time.perf_counter() - t0) / K * 1e3)
            return sorted(best)[1]

        r_ms = run_phase(reloc_only, st)
        c_ms = run_phase(collide_only, st)
        full = run_phase(jax.jit(
            lambda s: jax.lax.scan(
                lambda ss, _: (tiled.tiled_step_fn(ss, params, cfg), None),
                s, None, length=K)[0]), st)
        log(stage="phase_split", n=n, mult=mult, cap=cap,
            relocate_ms=round(r_ms, 3), collide_ms=round(c_ms, 3),
            full_ms=round(full, 3))
        del eng
    except Exception:
        log(stage="error", where=f"split_{n}",
            err=traceback.format_exc()[-600:])

log(stage="done")
