"""Round-2 TPU probe: the measurements the relay outage blocked in round 1.

Stages (most valuable first, each logged as one JSONL line to
/tmp/tpu_probe_r2.jsonl so a mid-run relay death still leaves data):

  A. compile-check the tiled pipeline (Pallas row collide + relocate) @64k
  B. tiled full-step @1M (tile_cap=16, pallas)
  C. tiled full-step @4M (tile_cap=16, pallas)
  D. tiled phase breakdown @1M and @4M (relocate / collide jnp vs pallas /
     integrate) -> decides whether the Pallas pack kernel (DESIGN.md §8) pays
  E. tile_cap sweep @1M (12, 24) and @4M (20, 24)
  F. solver="colored" @64k after the O(N)-row compaction
  G. ops/radix_sort.py compile + correctness @1M pairs

Run: JAX_PLATFORMS=axon PYTHONPATH=$PYTHONPATH:/root/.axon_site \
     python scripts/tpu_probe_r2.py
Measurement discipline per DESIGN.md §6: every window ends in a host fetch.
"""

import json
import os
import time
import traceback

T0 = time.time()
DEADLINE = T0 + 45 * 60
LOG = open("/tmp/tpu_probe_r2.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def left() -> float:
    return DEADLINE - time.time()


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

log(stage="init", devices=str(jax.devices()))

import numpy as np  # noqa: E402

from gpu_physics_engine_tpu import Engine, SimConfig  # noqa: E402
from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine  # noqa: E402


def measure_tiled(n, tile_cap, collide, warmup=3, window=20, trials=2,
                  label=""):
    cfg = SimConfig(max_particles=n, initial_particles=n,
                    pipeline="tiled", tile_cap=tile_cap,
                    tiled_collide=collide)
    t_build = time.time()
    eng = TiledEngine(cfg, seed=0)
    eng.run(warmup)
    float(eng.state.x[0, 0, 0])
    t_compile = time.time() - t_build
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        eng.run(window)
        float(eng.state.x[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / window * 1e3)
    log(stage=f"tiled{label}", n=n, tile_cap=tile_cap, collide=collide,
        ms_per_step=round(best, 3), compile_s=round(t_compile, 1))
    return eng, best


def main():
    # ---- A: compile check at 64k (fast fail if Mosaic rejects the kernel)
    try:
        eng, ms = measure_tiled(1 << 16, 16, "pallas", warmup=2, window=10,
                                trials=1, label="_compilecheck")
    except Exception:
        log(stage="tiled_compilecheck", error=traceback.format_exc()[-800:])
        # Pallas path broken on real TPU -> still measure the jnp tiled path
        try:
            measure_tiled(1 << 16, 16, "jnp", warmup=2, window=10, trials=1,
                          label="_compilecheck_jnp")
        except Exception:
            log(stage="tiled_compilecheck_jnp",
                error=traceback.format_exc()[-800:])
            return  # tiled pipeline entirely broken on device; stop here

    collide = "pallas"
    # ---- B/C: headline numbers
    for n in (1 << 20, 1 << 22):
        if left() < 300:
            log(stage="skip", what=f"tiled@{n}", reason="deadline")
            continue
        try:
            measure_tiled(n, 16, collide)
        except Exception:
            log(stage=f"tiled@{n}", error=traceback.format_exc()[-800:])

    # ---- D: phase breakdowns
    from gpu_physics_engine_tpu.utils.profiling import tiled_phase_breakdown
    for n in (1 << 20, 1 << 22):
        if left() < 300:
            log(stage="skip", what=f"phases@{n}", reason="deadline")
            continue
        try:
            cfg = SimConfig(max_particles=n, initial_particles=n,
                            pipeline="tiled", tile_cap=16,
                            tiled_collide=collide)
            eng = TiledEngine(cfg, seed=0)
            eng.run(3)
            float(eng.state.x[0, 0, 0])
            phases = tiled_phase_breakdown(cfg, eng.state, eng.params(),
                                           repeats=5)
            log(stage="tiled_phases", n=n,
                phases={k: round(v, 2) for k, v in phases.items()})
        except Exception:
            log(stage=f"tiled_phases@{n}", error=traceback.format_exc()[-800:])

    # ---- E: tile_cap sweep
    for n, caps in ((1 << 20, (12, 24)), (1 << 22, (20, 24))):
        for cap in caps:
            if left() < 240:
                log(stage="skip", what=f"cap{cap}@{n}", reason="deadline")
                continue
            try:
                measure_tiled(n, cap, collide, warmup=2, window=15, trials=2)
            except Exception:
                log(stage=f"tiled_cap{cap}@{n}",
                    error=traceback.format_exc()[-800:])

    # ---- F: colored solver @64k (post O(N)-row compaction)
    if left() > 240:
        try:
            cfg = SimConfig(max_particles=1 << 16, initial_particles=1 << 16,
                            solver="colored")
            eng = Engine(cfg, seed=0)
            eng.run(2)
            float(eng.state.x[0])
            t0 = time.perf_counter()
            eng.run(10)
            float(eng.state.x[0])
            log(stage="colored@64k",
                ms_per_step=round((time.perf_counter() - t0) / 10 * 1e3, 2))
        except Exception:
            log(stage="colored@64k", error=traceback.format_exc()[-800:])

    # ---- G: Pallas radix sort compile + correctness @1M
    if left() > 180:
        try:
            from gpu_physics_engine_tpu.ops.radix_sort import radix_sort_pairs
            rng = np.random.default_rng(0)
            n = 1 << 20
            keys = rng.integers(0, 1 << 24, n, dtype=np.uint32)
            payload = np.arange(n, dtype=np.uint32)
            f = jax.jit(lambda k, p: radix_sort_pairs(k, p, num_bits=24))
            ks, ps = f(jax.numpy.asarray(keys), jax.numpy.asarray(payload))
            ks_h = np.asarray(ks)
            ok = bool((ks_h[1:] >= ks_h[:-1]).all()
                      and (keys[np.asarray(ps)] == ks_h).all())
            t0 = time.perf_counter()
            for _ in range(5):
                ks, ps = f(ks, ps)
            _ = float(np.asarray(ks[0]))
            log(stage="radix_sort@1M", correct=ok,
                ms=round((time.perf_counter() - t0) / 5 * 1e3, 2))
        except Exception:
            log(stage="radix_sort@1M", error=traceback.format_exc()[-800:])

    log(stage="done")


if __name__ == "__main__":
    main()
