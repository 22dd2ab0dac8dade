"""Benchmark: frame time at the reference's headline particle counts.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline (BASELINE.md, reference README.md:80-87, RX 6800 XT):
  1M -> 3.66 ms/frame, 4M -> 22.70 ms/frame.
North star: 4M particles at <= 22 ms/step on one TPU chip.
vs_baseline = baseline_ms / our_ms at 4M (>1 means faster than baseline).

Methodology: the flagship config (reference world 3048x1048, radius-0.5
particles, colored Gauss-Seidel solver, Morton resort cadence 240 steps),
jitted step with donated buffers; warmup then timed windows with a single
device sync per window (per-step sync would measure tunnel latency, not
device time).  Step time here is simulation only — the reference's numbers
include its render pass, so the comparison slightly favors the reference's
critics; see BASELINE.md.
"""

import json
import time

import jax

from gpu_physics_engine_tpu import Engine, SimConfig

BASELINE_MS = {1_000_000: 3.66, 4_194_304: 22.70}
SIZES = [1_000_000, 4_194_304]
WARMUP = 4
WINDOW = 50
TRIALS = 3


def measure(n: int) -> float:
    cfg = SimConfig(max_particles=n, initial_particles=n)
    eng = Engine(cfg, seed=0)
    eng.run(WARMUP)
    _ = float(eng.state.x[0])  # drain the pipeline for real
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        eng.run(WINDOW)
        # Fetch a scalar of the final state to the host: proof the whole
        # window executed (block_until_ready alone proved unreliable over
        # the device tunnel).
        _ = float(eng.state.x[0])
        best = min(best, (time.perf_counter() - t0) / WINDOW * 1e3)
    return best


def main():
    results = {}
    for n in SIZES:
        results[n] = measure(n)
    ms_4m = results[4_194_304]
    out = {
        "metric": "frame_time_ms_at_4M_particles",
        "value": round(ms_4m, 4),
        "unit": "ms/step",
        "vs_baseline": round(BASELINE_MS[4_194_304] / ms_4m, 2),
        "detail": {
            f"{n}": {
                "ms_per_step": round(ms, 4),
                "baseline_ms": BASELINE_MS[n],
                "particle_steps_per_sec": round(n / ms * 1e3),
            }
            for n, ms in results.items()
        },
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
