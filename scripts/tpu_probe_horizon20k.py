"""Long-horizon stability lock (VERDICT r2 item 5).

1. 512k and 4M at the production tuned configs for >= 20k steps,
   sampling deferred population + stale-pair fraction every 960 steps:
   shows the plateau the round-2 probes (5 760 steps) could only argue.
2. 3M outlier diagnosis: the BENCH_r02 3M row showed stale 0.38% (~5x
   the curve norm).  Sample 3M long-horizon at the tuned pick AND at
   the 2M-style mult 4.4 alternative to decide re-tune vs artifact.

Runs with the watchdog ON (the round-3 self-defense): watchdog_events
in the log shows whether production configs ever trip it (they must
not — that is itself a regression check).

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_horizon20k.py > /tmp/probe_h20k.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_horizon20k.jsonl", "a", buffering=1)


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

from gpu_physics_engine_tpu import make_tuned_engine  # noqa: E402
from gpu_physics_engine_tpu.ops.tiled import stale_pair_fraction  # noqa: E402

WINDOW = 960  # 4 sweep cycles per sample
HORIZON = 21_120  # 22 windows


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


run_case("512k_tuned", 512_000)
run_case("4m_tuned", 4_194_304)
run_case("3m_tuned", 3_000_000)
run_case("3m_alt_mult44", 3_000_000, tile_multiplier=4.4, tile_cap=6)
log(stage="done")
