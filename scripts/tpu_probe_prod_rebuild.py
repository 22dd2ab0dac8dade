"""tiled_sweep="rebuild" on the PRODUCTION (Jacobi) path, long-horizon.

The 20k-step horizon probe (docs/probes_r3/tpu_probe_horizon20k.jsonl)
showed the 512k tuned row's stale-pair population CREEPING (0.01 ->
3.2% over 21k steps) until the watchdog rescued it at ~11.5k steps —
the budgeted relocate sweep cannot resolve displacement chains there
either (same mechanism as the 4M GS creep).  ops/tiled.rebuild bounds
staleness BY CONSTRUCTION at the sweep-cadence accumulation.  This
measures, at the production tuned configs with tiled_sweep="rebuild"
and the watchdog ON (wd_events must stay 0 = self-defense never
needed):

  (a) the rebuild's own cost at the 512k production geometry,
  (b) 512k long-horizon (the known creeper),
  (c) 100k / 256k long-horizon (coarse-tile rows, jam-prone per the
      round-2 small-size probes, never horizon-tested past 5 760).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_prod_rebuild.py > /tmp/probe_prod_rebuild.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_prod_rebuild.jsonl", "a", buffering=1)


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
HORIZON = 21_120  # 22 windows, same lock horizon as tpu_probe_horizon20k


# (a) rebuild cost at the 512k production geometry
try:
    eng = make_tuned_engine(512_000, seed=0, tiled_sweep="rebuild")
    eng.state = eng._sweep(eng.state, eng._sweep_off())  # compile
    float(eng.state.x[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(8):
        eng.state = eng._sweep(eng.state, eng._sweep_off())
    float(eng.state.x[0, 0, 0])
    log(stage="rebuild_cost", name="512k_prod",
        ms=round((time.perf_counter() - t0) / 8 * 1e3, 3))
    del eng
except Exception:
    log(stage="error", name="rebuild_cost",
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
                wd_events=eng.watchdog_events)
        del eng
    except Exception:
        log(stage="error", case=name, err=traceback.format_exc()[-500:])


# (b) the known creeper, rebuild at the default 240 cadence
run_case("512k_rb240", 512_000, tiled_sweep="rebuild")
# (c) coarse-tile small rows, never horizon-locked: tuned first
#     (does the creep exist?), then rebuild
run_case("100k_tuned", 100_000)
run_case("256k_tuned", 256_000)
run_case("100k_rb240", 100_000, tiled_sweep="rebuild")
run_case("256k_rb240", 256_000, tiled_sweep="rebuild")
log(stage="done")
