"""Hybrid sweep (tiled_rebuild_every) long-horizon verdict at 100k-512k.

Round-4 prod_rebuild probe (docs/probes_r4/tpu_probe_prod_rebuild.jsonl,
21k-step horizon): the tuned relocate-sweep rows creep/jam (256k hit
watchdog x7), pure rebuild-every-240 is watchdog-free everywhere but
costs +44%/step at 512k (rebuild ~113 ms there).  The hybrid runs the
budgeted relocate sweep at 240 with every k-th sweep upgraded to the
wholesale rebuild: chain residue bounded at the k-cadence accumulation
for 1/k of the tax.  This measures:

  (a) clean rebuild cost per geometry (the prod_rebuild number was
      polluted by concurrent TPU processes),
  (b) 21k-step horizon at hy8 (rebuild every 1920 steps) for
      512k/256k, hy4 as the 512k fallback, 100k pure-rb240 control
      (it was free there),
  (c) clean tuned-row timing for the cost comparison.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_hybrid.py > /tmp/probe_hybrid.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_hybrid.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

from gpu_physics_engine_tpu import make_tuned_engine  # noqa: E402
from gpu_physics_engine_tpu.ops.tiled import stale_pair_fraction  # noqa: E402

WINDOW = 960
HORIZON = 21_120


# (a) clean rebuild cost per geometry
for n in (100_000, 256_000, 512_000):
    try:
        eng = make_tuned_engine(n, seed=0, tiled_sweep="rebuild")
        eng.state = eng._sweep(eng.state, eng._sweep_off())  # compile
        float(eng.state.x[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(8):
            eng.state = eng._sweep(eng.state, eng._sweep_off())
        float(eng.state.x[0, 0, 0])
        log(stage="rebuild_cost", n=n,
            ms=round((time.perf_counter() - t0) / 8 * 1e3, 3))
        del eng
    except Exception:
        log(stage="error", name=f"rebuild_cost_{n}",
            err=traceback.format_exc()[-400:])


def run_case(name, n, **overrides):
    try:
        eng = make_tuned_engine(n, seed=0, **overrides)
        stale_fn = jax.jit(lambda s: stale_pair_fraction(s, eng.config))
        iv = eng.config.tiled_relocate_interval
        done = 0
        while done < HORIZON:
            of0 = float(eng.state.overflow_count)
            t0 = time.perf_counter()
            eng.run(WINDOW)
            stale = float(stale_fn(eng.state)) * 100.0
            ms = (time.perf_counter() - t0) / WINDOW * 1e3
            of1 = float(eng.state.overflow_count)
            done += WINDOW
            log(stage="window", case=name, n=n, steps=done,
                ms=round(ms, 3),
                defer_pop_pct=round((of1 - of0) / WINDOW / n * 100 * iv,
                                    4),
                stale_pct=round(stale, 4),
                wd_events=eng.watchdog_events,
                rebuilds=eng.rebuild_sweeps)
        del eng
    except Exception:
        log(stage="error", case=name, err=traceback.format_exc()[-500:])


# (c) clean tuned timing, short (4 windows) — cost anchors
def quick_case(name, n, windows=4, **overrides):
    try:
        eng = make_tuned_engine(n, seed=0, **overrides)
        best = float("inf")
        for w in range(windows):
            t0 = time.perf_counter()
            eng.run(WINDOW)
            float(eng.state.x[0, 0, 0])
            if w:
                best = min(best, (time.perf_counter() - t0) / WINDOW * 1e3)
        log(stage="quick", case=name, n=n, ms=round(best, 3))
        del eng
    except Exception:
        log(stage="error", case=name, err=traceback.format_exc()[-400:])


quick_case("512k_tuned_quick", 512_000)
quick_case("512k_hy8_quick", 512_000, tiled_rebuild_every=8)

# (b) the horizon verdicts
run_case("512k_hy8", 512_000, tiled_rebuild_every=8)
run_case("256k_hy8", 256_000, tiled_rebuild_every=8)
run_case("512k_hy4", 512_000, tiled_rebuild_every=4)
log(stage="done")
