"""Benchmark: frame time across the reference's full published size curve.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": ...}

Baseline (BASELINE.md, reference README.md:80-87, RX 6800 XT, ms/frame):
  100k 1.03 | 256k 1.28 | 512k 1.88 | 756k 2.53 | 1M 3.66
  | 2M 8.417 | 3M 15.62 | 4M 22.70
North star: 4M particles at <= 22 ms/step on one TPU chip.
The headline value/vs_baseline is the 4M FRAME time (sim + device render
per frame — the reference's own metric, state.rs:115-140) when the frame
loop was measured, else the sim step time; "headline" names which.

Methodology: the production persistent-tiled pipeline per size, with the
hardware-swept tile geometry (scripts/tpu_sweep_curve*.py; greedy slot
matching on mid-size grids keeps steady-state deferral low).  Per size:
~480 settling steps (random scenes churn movers for the first few hundred
steps), then two 480-step windows (min) that naturally include the
periodic exact-relocate sweeps (every 240 steps) — so the reported
ms/step is the honest steady-state average, maintenance included.  Every
window ends with a host fetch of one scalar: on tunneled TPU runtimes
`block_until_ready` can return before remote completion (DESIGN.md §6),
so fetch-sync is the only honest clock.

UN-HANGABILITY (round-3 lesson: the driver got rc=124 and zero output
under a degraded remote compile service):
  - a watchdog thread enforces a global hard deadline AND a
    no-progress stall bound; on either it prints the final JSON from
    whatever completed (never nothing) and os._exit(0)s;
  - fine-grained progress ticks inside each measurement keep the stall
    clock honest (a slow-but-moving service is not a stall);
  - every completed row is flushed to stderr and /tmp/bench_partial.json
    immediately;
  - a liveness fetch slower than _DEGRADED_FETCH_S switches to degraded
    mode: halved windows, headline sizes first, optional rows dropped.
"""

import json
import os
import socket
import sys
import threading
import time

# The axon TPU plugin connects to a local stdio-relay; if the relay is
# down, jax device init retries forever.  Probe it and wait (bounded)
# rather than hanging the benchmark harness.
_RELAY_PORTS = (8082, 8083, 8087)
_RELAY_DEADLINE_S = 1200


def _on_axon() -> bool:
    return "axon" in os.environ.get("JAX_PLATFORMS", "").split(",")


def _wait_for_relay():
    if not _on_axon():
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
if _on_axon():
    from gpu_physics_engine_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(salt=False)

# The relay port being open does NOT mean the remote runtime works: a
# wedged runtime (observed round 3: device listing OK, a trivial
# scalar compile+fetch hung > minutes) would hang the bench — and the
# driver — forever.  Prove liveness with a bounded tiny fetch first.
# Wedges clear in 20-40 min (CLAUDE.md), and JAX never RESENDS a
# black-holed request — so liveness is a retry LOOP: a fresh probe
# every _REPING_S until the budget runs out (round 4 burned the whole
# driver window on ONE probe and emitted value:null with ~1400 s left).
_RUNTIME_DEADLINE_S = 900
_REPING_S = 180

# liveness fetch slower than this = degraded compile service -> short
# windows, fewer rows (round 3 measured 172-570 s fetches while degraded;
# healthy is < 2 s)
_DEGRADED_FETCH_S = 30.0

# watchdog bounds (env-overridable).  The round-3 driver killed the
# bench ~2300 s in; finishing early with partials always beats rc=124.
_HARD_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 1900))
_STALL_S = float(os.environ.get("BENCH_STALL_S", 900))


def _runtime_alive(budget_s=_RUNTIME_DEADLINE_S):
    """(alive, fetch_seconds, waited_seconds).

    Re-pinging liveness loop: launches a fresh bounded tiny
    compile+fetch probe thread every _REPING_S — wedges clear in
    20-40 min and JAX never RESENDS a black-holed request, so waiting
    on the FIRST probe alone (the round-4 behavior: one 900 s probe,
    then give up with ~1400 s of driver budget unused) misses a wedge
    that clears mid-window.  The first probe whose fetch completes
    wins; hung probe threads are daemons and leak until exit."""
    if not _on_axon():
        return True, 0.0, 0.0  # local backends don't wedge
    result = {}

    def probe():
        import jax.numpy as jnp
        t0 = time.time()
        v = float(jnp.arange(8.0).sum())
        if v == 28.0:
            result.setdefault("s", time.time() - t0)

    t_start = time.time()
    next_launch = t_start
    while time.time() - t_start < budget_s and "s" not in result:
        now = time.time()
        if now >= next_launch:
            threading.Thread(target=probe, daemon=True).start()
            next_launch = now + _REPING_S
            if now - t_start > 1:
                print(f"[bench] runtime liveness: re-ping at "
                      f"+{now - t_start:.0f}s (budget {budget_s:.0f}s)",
                      file=sys.stderr, flush=True)
        time.sleep(2)
    return ("s" in result, result.get("s", float("inf")),
            time.time() - t_start)


BASELINE_MS = {100_000: 1.03, 256_000: 1.28, 512_000: 1.88, 756_000: 2.53,
               1_048_576: 3.66, 2_000_000: 8.417, 3_000_000: 15.62,
               4_194_304: 22.70}

# per-size production geometry: single source of truth is the library
# (core/tuned.py — hardware-swept; method + rationale in PERF.md).
# The relocate interval is the mid-curve fix: the relocate phase is
# ~half of every step yet only moves storage, so running it every k-th
# step wins 25-40% at every size.
from gpu_physics_engine_tpu.core.tuned import (  # noqa: E402
    QUALITY_EXPECTATION as _QUALITY, TUNED_NEWTON as _NEWTON,
    TUNED_TILE_GEOMETRY as _TILE_GEOM, tuned_overrides as _overrides)

SETTLE = 480     # steps before timing (mover churn decays).  Multiple of
                 # the 240-step sweep cadence so the settle phase runs the
                 # exact chunk-length pattern of the timed window — run()
                 # compiles one scanned program per distinct window length
                 # (e.g. {128, 112} at chunk 128), and a first-occurrence
                 # compile inside the timed window would dominate it.
WINDOW = 480     # timed steps: 2 full 240-step sweep cycles included
FRAME_WINDOW = 240  # timed sim+render frames per size


# ---------------------------------------------------------------------------
# progress / watchdog: the bench must NEVER end without printing a JSON line
# ---------------------------------------------------------------------------

_STATE = {
    "t_start": time.time(),
    "last_tick": time.time(),
    "inflight": None,      # label of the measurement currently running
    "detail": {},
    "emitted": False,
    "degraded": False,
}
_EMIT_LOCK = threading.Lock()


def _tick(label=None):
    """Progress heartbeat: a measurement is alive (resets the stall clock)."""
    _STATE["last_tick"] = time.time()
    if label is not None:
        _STATE["inflight"] = label


def _elapsed():
    return time.time() - _STATE["t_start"]


def _progress(key, row):
    """Record a completed row: flush to stderr + the partial file."""
    _STATE["detail"][key] = row
    _tick()
    print(f"[bench +{_elapsed():.0f}s] {key}: {json.dumps(row)[:200]}",
          file=sys.stderr, flush=True)
    try:
        with open("/tmp/bench_partial.json", "w") as f:
            json.dump(_STATE["detail"], f)
    except OSError:
        pass


def _emit(note=None):
    """Assemble + print the one JSON line from whatever completed.
    Idempotent (first caller wins) — the watchdog and main both call it."""
    with _EMIT_LOCK:
        if _STATE["emitted"]:
            return
        _STATE["emitted"] = True
    detail = _STATE["detail"]
    row_4m = detail.get(str(4_194_304), {})
    frame_4m = row_4m.get("frame_ms")
    ms_4m = row_4m.get("ms_per_step")
    if isinstance(frame_4m, (int, float)):
        value, headline = frame_4m, "frame_ms"
    else:
        value, headline = ms_4m, "ms_per_step"
    out = {
        "metric": "frame_time_ms_at_4M_particles",
        "value": value,
        "unit": "ms/frame" if headline == "frame_ms" else "ms/step",
        "vs_baseline": (round(BASELINE_MS[4_194_304] / value, 3)
                        if isinstance(value, (int, float)) and value
                        else None),
        "headline": headline,
        "degraded_mode": _STATE["degraded"],
        "elapsed_s": round(_elapsed(), 1),
        "detail": detail,
    }
    if note:
        out["note"] = note
    try:
        out["device"] = str(jax.devices()[0])
    except Exception:
        pass
    print(json.dumps(out), flush=True)


def _watchdog():
    """Enforce the hard deadline and the no-progress stall bound; on
    either, print the final JSON from completed rows and exit.  os._exit
    is deliberate: the hung device call cannot be joined, and the driver
    killing us later (rc=124, zero output) is strictly worse."""
    while not _STATE["emitted"]:
        time.sleep(5)
        now = time.time()
        note = None
        if now - _STATE["t_start"] > _HARD_DEADLINE_S:
            note = (f"hard deadline {_HARD_DEADLINE_S:.0f}s hit; "
                    f"in-flight: {_STATE['inflight']}")
        elif now - _STATE["last_tick"] > _STALL_S:
            note = (f"no progress for {_STALL_S:.0f}s (runtime stall); "
                    f"in-flight: {_STATE['inflight']}")
        if note:
            print(f"[bench watchdog] {note}", file=sys.stderr, flush=True)
            _emit(note=note)
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)


# ---------------------------------------------------------------------------
# measurements
# ---------------------------------------------------------------------------

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
        _tick(f"tiled {n}: init+settle")
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
    _tick(f"tiled {n}: windows")
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
        _tick()
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


def measure_frames(eng):
    """The reference's actual metric: ms per frame where every frame
    runs sim AND the device render (state.rs:115-140 submits both every
    frame; BASELINE.md numbers include the render pass).  Scanned
    windows, checksum fetch = sync.  Returns (best_ms, [window_ms,...])
    — both windows go in the JSON row so degraded-mode poisoning stays
    distinguishable from genuine tail variance (ADVICE r4)."""
    eng.render_run(FRAME_WINDOW)  # compile + settle the fused window
    _tick()
    # min of two timed windows: a one-off compile landing inside a
    # window (e.g. the 240-step sweep program the settle window never
    # reached — observed 1263 ms/frame in a degraded-mode run) must
    # not poison the row
    windows = []
    for _ in range(2):
        t0 = time.perf_counter()
        eng.render_run(FRAME_WINDOW)
        windows.append((time.perf_counter() - t0) / FRAME_WINDOW * 1e3)
        _tick()
    return min(windows), [round(w, 3) for w in windows]


def measure_render(eng):
    """1280x720 frame cost: (device_ms, end_to_end_ms).

    device_ms scans 16 frames in one program (render/device.py::
    render_throughput_ms) — the chip's actual per-frame cost.  The
    end-to-end number adds the tunnel: one dispatched program plus the
    2.7 MB image download (~43 ms at the relay's ~64 MB/s), which bounds
    host display cadence, not device rendering."""
    from gpu_physics_engine_tpu.render.device import render_throughput_ms
    dev_ms = render_throughput_ms(eng.state, eng.config)
    _tick()
    eng.render_frame()  # compile the dispatch path
    t0 = time.perf_counter()
    for _ in range(3):
        eng.render_frame()
    return dev_ms, (time.perf_counter() - t0) / 3 * 1e3


def measure_gs(n: int, with_frames: bool = False) -> dict:
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
    _tick(f"gs {n}: init+settle")
    eng = TiledEngine(cfg, seed=0, chunk=64)
    eng.run(288)  # settles past the first 240-step sweep compile
    float(eng.state.x[0, 0, 0])
    _tick(f"gs {n}: windows")
    ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(240)
        float(eng.state.x[0, 0, 0])
        ms = min(ms, (time.perf_counter() - t0) / 240 * 1e3)
        _tick()
    # storage-health columns (PERF.md "GS reference semantics"): the
    # stale-pair fraction is the one divergence class vs the
    # reference's rebuilt-every-frame grid; watchdog events show any
    # live mitigation that ran inside the timed windows.
    stale = round(float(eng._stale_frac(eng.state)) * 100.0, 4)
    wd = eng.watchdog_events
    row = {"ms_per_step": round(ms, 3), "cap": cap,
           "sweep_interval": sweep_iv, "sweep": sweep_mech,
           "stale_pct": stale, "wd_events": wd,
           "vs_baseline": round(BASELINE_MS[n] / ms, 3)}
    if with_frames:
        # the reference's frame metric on the reference-exact solver
        # (render_run covers the parity-GS chunk since round 4)
        try:
            _tick(f"gs {n}: frames")
            frame_ms, frame_windows = measure_frames(eng)
            row["frame_ms"] = round(frame_ms, 3)
            row["frame_ms_windows"] = frame_windows
            row["frame_vs_baseline"] = round(BASELINE_MS[n] / frame_ms, 3)
        except Exception as e:
            row["frame_ms"] = f"error: {type(e).__name__}"[:80]
    del eng
    return row


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
    _tick()
    t0 = time.perf_counter()
    eng.run(96)
    float(eng.state.x[0, 0, 0])
    return (time.perf_counter() - t0) / 96 * 1e3


def measure_16m() -> dict:
    """Beyond the reference's 4M ceiling: 16M particles in a 4x world
    (same density class), the single-chip scaling headroom row.
    Round-5 retune (docs/probes_r5/tpu_probe_16m_retune2.jsonl): the
    round-2 pick (wide world, cap8, iv1) measured 26.0 ms; the
    square-ish 4x world + relocate-interval 4 runs 17.0 ms at
    0.7%/step deferred (iv2 = 20.2 ms at 0.17% if quality-max is
    wanted; cap6/iv4 = 9.8 ms but at the 7.9%/step jam class —
    rejected)."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    n = 1 << 24
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=4310.0, world_height=2965.0,
                    pipeline="tiled", tile_cap=8, tile_multiplier=3.3,
                    tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=_NEWTON)
    _tick("16m: init+settle")
    eng = TiledEngine(cfg, seed=0)
    eng.run(64)
    float(eng.state.x[0, 0, 0])
    _tick("16m: windows")
    ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(48)
        float(eng.state.x[0, 0, 0])
        ms = min(ms, (time.perf_counter() - t0) / 48 * 1e3)
        _tick()
    del eng
    return {"ms_per_step": round(ms, 3),
            "particle_steps_per_sec": round(n / ms * 1e3),
            "note": "4x the reference's max size (its curve ends at 4M)"}


def measure_32m() -> dict:
    """32M particles — 8x the reference's ceiling, one chip.  The
    SQUARER 8x world is load-bearing: the original 12192x2096 shape
    put TX=7392 columns in every kernel block and relocate fusion and
    OOM'd at every cap (scoped HBM at cap6/8, scoped VMEM at cap5 —
    five signatures in docs/probes_r5/tpu_probe_32m*.jsonl); 6096x4192
    halves TX and runs.  Settled rate ~50 ms/step (the early 18.6 ms
    windows were a pre-compaction transient), stale ~8% contained by
    the watchdog runaway sweep — the storage-pressure frontier."""
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    n = 1 << 25
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    world_width=6096.0, world_height=4192.0,
                    pipeline="tiled", tile_cap=6, tile_multiplier=3.3,
                    tiled_relocate_interval=4,
                    tiled_uniform_radius=True, tiled_newton=_NEWTON)
    _tick("32m: init+settle")
    eng = TiledEngine(cfg, seed=0)
    eng.run(112)
    float(eng.state.x[0, 0, 0])
    _tick("32m: windows")
    # report the LAST window, not the min: the uniform-spawn scene is
    # still compacting at this size and a fast pre-compaction window
    # (18.6 ms in the probe, vs ~50 settled) would otherwise be
    # published as the rate (round-5 honesty correction); both window
    # times go in the row
    windows = []
    for _ in range(2):
        t0 = time.perf_counter()
        eng.run(48)
        float(eng.state.x[0, 0, 0])
        windows.append(round((time.perf_counter() - t0) / 48 * 1e3, 3))
        _tick()
    del eng
    ms = windows[-1]
    return {"ms_per_step": ms, "window_ms": windows,
            "particle_steps_per_sec": round(n / ms * 1e3),
            "note": "8x the reference's max size; squarer 8x world"}


def main():
    global SETTLE, WINDOW, FRAME_WINDOW
    # ONE clock from process start (module import): relay wait and
    # liveness probing CONSUME the budget — round 4's reset-after-
    # liveness could push total wall past the driver's kill (rc=124)
    if not _wait_for_relay():
        print(json.dumps({
            "metric": "frame_time_ms_at_4M_particles",
            "value": None, "unit": "ms/step", "vs_baseline": None,
            "error": "TPU tunnel relay unreachable (ports 8082/8083/8087 "
                     f"refused for {_RELAY_DEADLINE_S}s); device unavailable",
        }), flush=True)
        sys.exit(0)
    # retry until the budget is nearly gone: keep ~420 s so a late
    # wedge-recovery still lands a degraded headline row (any honest
    # number beats value:null)
    liveness_budget = max(60.0, _HARD_DEADLINE_S - _elapsed() - 420)
    alive, fetch_s, waited_s = _runtime_alive(liveness_budget)
    if not alive:
        print(json.dumps({
            "metric": "frame_time_ms_at_4M_particles",
            "value": None, "unit": "ms/step", "vs_baseline": None,
            "error": "TPU runtime wedged: relay port open but no liveness "
                     f"probe completed in {waited_s:.0f}s of re-pinging "
                     f"(every {_REPING_S}s)",
        }), flush=True)
        os._exit(0)  # the stuck fetch threads cannot be joined
    if fetch_s > _DEGRADED_FETCH_S:
        # the FIRST fetch pays client/device init over the tunnel
        # (measured 80 s in an otherwise healthy round-5 session whose
        # rows then ran at full speed) — a second, fresh tiny compile
        # isolates the compile service's actual state before dooming
        # the run to the degraded tier
        result2 = {}
        # unique length per run so the persistent cache cannot serve a
        # stale hit and mask a slow compile service
        n2 = 17 + int(time.time()) % 97

        def probe2():
            import jax.numpy as jnp
            t0 = time.time()
            if float(jnp.arange(float(n2)).sum()) == n2 * (n2 - 1) / 2:
                result2["s"] = time.time() - t0

        th2 = threading.Thread(target=probe2, daemon=True)
        th2.start()
        th2.join(min(300.0, _HARD_DEADLINE_S - _elapsed() - 420))
        fetch2 = result2.get("s", float("inf"))
        print(f"[bench] first fetch {fetch_s:.0f}s; fresh-compile "
              f"re-check {fetch2:.0f}s", file=sys.stderr, flush=True)
        fetch_s = min(fetch_s, fetch2)
    remaining_s = _HARD_DEADLINE_S - _elapsed()
    degraded = fetch_s > _DEGRADED_FETCH_S or remaining_s < 1500
    headline_only = remaining_s < 700
    _STATE["degraded"] = degraded
    _tick()
    if degraded:
        # a sick compile service or a budget eaten by the liveness
        # wait: halve every window, keep only the headline-critical
        # rows, and let the watchdog cut us off with whatever landed
        SETTLE, WINDOW, FRAME_WINDOW = 240, 240, 120
        print(f"[bench] DEGRADED mode (liveness fetch {fetch_s:.0f}s, "
              f"waited {waited_s:.0f}s, {remaining_s:.0f}s left)",
              file=sys.stderr, flush=True)
    if headline_only:
        SETTLE, WINDOW, FRAME_WINDOW = 120, 120, 60
        print(f"[bench] HEADLINE-ONLY mode ({remaining_s:.0f}s left)",
              file=sys.stderr, flush=True)
    threading.Thread(target=_watchdog, daemon=True).start()

    soft_deadline_s = _HARD_DEADLINE_S - 300  # leave room for GS/render rows
    detail = _STATE["detail"]
    order = [4_194_304, 1_048_576, 100_000, 256_000, 512_000, 756_000,
             2_000_000, 3_000_000]  # headline sizes first
    if degraded:
        order = [4_194_304, 1_048_576, 2_000_000]
    if headline_only:
        order = [4_194_304]
    eng_4m = None
    for n in order:
        # past the deadline, skip remaining sizes as long as SOMETHING
        # was measured (the headline runs first)
        if _elapsed() > soft_deadline_s and detail:
            _progress(str(n), {"skipped": "soft deadline"})
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
            # loud quality regression flag (core/tuned.py
            # QUALITY_EXPECTATION: documented equilibrium + headroom)
            exp = _QUALITY.get(n)
            if exp and (defer_pct > exp[0] or stale_pct > exp[1]):
                row["quality_note"] = (
                    f"EXCEEDS documented bound: deferred "
                    f"{defer_pct:.2f}% (bound {exp[0]}%), stale "
                    f"{stale_pct:.2f}% (bound {exp[1]}%)")
            # the reference's metric: sim + render in one loop
            # (VERDICT r2 item 3) + per-size device render cost
            try:
                if _elapsed() > soft_deadline_s:
                    raise TimeoutError("soft deadline")
                _tick(f"tiled {n}: frames")
                frame_ms, frame_windows = measure_frames(eng)
                row["frame_ms"] = round(frame_ms, 3)
                row["frame_ms_windows"] = frame_windows
                row["frame_vs_baseline"] = round(
                    BASELINE_MS[n] / frame_ms, 3)
            except Exception as e:
                row["frame_ms"] = f"error: {type(e).__name__}"[:80]
            try:
                from gpu_physics_engine_tpu.render.device import (
                    render_throughput_ms)
                _tick(f"tiled {n}: render")
                row["render_ms"] = round(render_throughput_ms(
                    eng.state, eng.config), 2)
            except Exception as e:
                row["render_ms"] = f"error: {type(e).__name__}"[:80]
            _progress(str(n), row)
            if n == 4_194_304:
                eng_4m = eng
            else:
                del eng
        except Exception as e:
            _progress(str(n), {"error": f"{type(e).__name__}: {e}"[:160]})
    if eng_4m is not None:
        try:
            _tick("render 4m")
            dev_ms, e2e_ms = measure_render(eng_4m)
            _progress("render_4m_ms", round(dev_ms, 2))
            _progress("render_4m_download_ms", round(e2e_ms, 1))
        except Exception as e:
            _progress("render_4m_ms", f"error: {type(e).__name__}"[:80])
        del eng_4m
    if not degraded and _elapsed() < soft_deadline_s:
        try:
            _tick("substeps2 4m")
            _progress("substeps2_4m_ms", round(measure_substeps2(), 3))
        except Exception as e:
            _progress("substeps2_4m_ms", f"error: {type(e).__name__}"[:80])
    # reference-exact GS rows (flat in n — PERF.md has the full curve).
    # 1M anchors the dilute pole; 2M/3M/4M are the loaded class where
    # the world-fixed GS grid cost meets/beats the reference's own GPU.
    gs_rows = ((1_048_576, "gs_1m"), (2_000_000, "gs_2m"),
               (3_000_000, "gs_3m"), (4_194_304, "gs_4m"))
    if degraded:
        gs_rows = ((4_194_304, "gs_4m"),)
    if headline_only:
        gs_rows = ()
    for gs_n, key in gs_rows:
        if _elapsed() > soft_deadline_s:
            break
        try:
            _progress(key, measure_gs(gs_n, with_frames=(key == "gs_4m")))
        except Exception as e:
            _progress(key, {"error": f"{type(e).__name__}: {e}"[:120]})
    # beyond-reference scaling row (cheap when the cache is warm; the
    # watchdog bounds it like everything else)
    if not degraded and _elapsed() < soft_deadline_s:
        try:
            _progress("scale_16m", measure_16m())
        except Exception as e:
            _progress("scale_16m", {"error": f"{type(e).__name__}: {e}"[:120]})
    if not degraded and _elapsed() < soft_deadline_s:
        try:
            _progress("scale_32m", measure_32m())
        except Exception as e:
            _progress("scale_32m", {"error": f"{type(e).__name__}: {e}"[:120]})
    _emit()


if __name__ == "__main__":
    main()
