"""Small-size re-sweep under the rebuild sweep (the open optimization).

Round-4 verdict (PERF.md "The small-size sweep verdict"): 512k must run
tiled_sweep="rebuild" (only watchdog-free class at 21k steps) but pays
+44% vs the jam-class relocate pick — 1.541 vs 1.072 ms/step.  The tax
is mostly the rebuild itself amortized over the 240-step cadence
(126.9 ms / 240 = 0.53 ms/step) and the rebuild cost tracks SLOT COUNT
(tiles x cap): the tuned (6.6, 7) geometry stores 2.05M slots for 512k
particles.  Coarser tiles cut slots: (8.8, 10) ~ 1.65M, (13.2, 14)
~ 1.02M — if the per-step sweep cost at the coarser tile survives, the
amortized total drops.  Candidates also include cadence 480 at the
tuned geometry (half the tax, 2x the 240-step natural accumulation).

Per candidate: 480 settle + 2x480-step windows (rebuilds included) ->
ms/step + deferred population + stale; then a 2400-step horizon trend
on everything that beats the incumbent.

  cd /root/repo && JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  nohup python scripts/tpu_probe_512k_rebuild.py > /tmp/probe_512k.log 2>&1 &
"""

import json
import os
import time
import traceback

T0 = time.time()
LOG = open("/tmp/tpu_probe_512k.jsonl", "a", buffering=1)


def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))

# base = incumbent ms/step at that size under rebuild@240
# (docs/probes_r4/tpu_probe_prod_rebuild.jsonl); "incumbent" rows skip
# the horizon stage (already horizon-verified by the prod_rebuild probe).
CANDS = [
    # 512k geometry ladder: fewer slots = cheaper rebuild, IF the
    # coarser-tile per-step sweep survives
    dict(tag="512k_m66c7_iv4_s240", n=512_000, mult=6.6, cap=7, iv=4,
         cad=240, base=1.541, incumbent=True),
    dict(tag="512k_m88c10_iv4_s240", n=512_000, mult=8.8, cap=10, iv=4,
         cad=240, base=1.541),
    dict(tag="512k_m110c12_iv4_s240", n=512_000, mult=11.0, cap=12, iv=4,
         cad=240, base=1.541),
    dict(tag="512k_m132c14_iv4_s240", n=512_000, mult=13.2, cap=14, iv=4,
         cad=240, base=1.541),
    dict(tag="512k_m66c7_iv4_s480", n=512_000, mult=6.6, cap=7, iv=4,
         cad=480, base=1.541),
    # stale-accumulation halving at the cheap-rebuild small sizes:
    # rebuild@120 costs +0.08 ms/step at 100k (19.5 ms rebuild), +0.23
    # at 256k (54.6 ms) — buys half the 240-step stale window
    dict(tag="100k_m22c8_iv2_s120", n=100_000, mult=22.0, cap=8, iv=2,
         cad=120, base=0.330),
    dict(tag="256k_m121c9_iv2_s120", n=256_000, mult=12.1, cap=9, iv=2,
         cad=120, base=0.846),
]


def make(c):
    from gpu_physics_engine_tpu import SimConfig
    from gpu_physics_engine_tpu.core.tiled_engine import TiledEngine
    cfg = SimConfig(max_particles=c["n"], initial_particles=c["n"],
                    pipeline="tiled", tile_multiplier=c["mult"],
                    tile_cap=c["cap"], tiled_match="greedy",
                    tiled_relocate_interval=c["iv"],
                    tiled_uniform_radius=True, tiled_newton=True,
                    tiled_sweep="rebuild", sort_interval_steps=c["cad"],
                    tiled_watchdog=True)
    return TiledEngine(cfg, seed=0, chunk=128)


def window(eng, steps):
    t0 = time.perf_counter()
    eng.run(steps)
    float(eng.state.x[0, 0, 0])
    return (time.perf_counter() - t0) * 1e3 / steps


results = {}
try:
    for c in CANDS:
        if time.time() - T0 > 45 * 60:
            log(stage="skip", tag=c["tag"])
            continue
        try:
            eng = make(c)
            tb = time.time()
            eng.run(16)
            float(eng.state.x[0, 0, 0])
            log(stage="compiled", tag=c["tag"],
                compile_s=round(time.time() - tb, 1),
                tiles=int(eng.state.pid.shape[0] * eng.state.pid.shape[1]),
                slots=int(eng.state.pid.size))
            window(eng, 464)  # settle to ~480
            of0 = int(eng.state.overflow_count)
            ms1 = window(eng, 480)
            ms2 = window(eng, 480)
            of1 = int(eng.state.overflow_count)
            defer_pct = (of1 - of0) / 960 / c["n"] * 100 * c["iv"]
            ms = min(ms1, ms2)
            results[c["tag"]] = ms
            log(stage="window", tag=c["tag"], ms1=round(ms1, 3),
                ms2=round(ms2, 3), ms=round(ms, 3),
                defer_pop_pct=round(defer_pct, 3),
                stale_pct=round(float(eng._stale_frac(eng.state)) * 100, 4),
                wd=int(getattr(eng, "watchdog_events", 0)))
        except Exception:
            log(stage="cand_error", tag=c["tag"],
                err=traceback.format_exc()[-400:])

    # horizon trend on adoptable candidates: geometry alternatives must
    # beat the incumbent by >3%; cadence-120 rows qualify if within 1.35x
    # of base (they buy stale quality, not speed)
    for c in CANDS:
        ms = results.get(c["tag"])
        if ms is None or c.get("incumbent"):
            continue
        bound = c["base"] * (1.35 if c["cad"] == 120 else 0.97)
        if ms > bound:
            continue
        if time.time() - T0 > 50 * 60:
            log(stage="skip_horizon", tag=c["tag"])
            continue
        try:
            eng = make(c)
            eng.run(16)
            of_prev = int(eng.state.overflow_count)
            for w in range(5):
                ms_w = window(eng, 480)
                of = int(eng.state.overflow_count)
                log(stage="horizon", tag=c["tag"], w=w,
                    ms=round(ms_w, 3),
                    defer_pop_pct=round((of - of_prev) / 480 / c["n"]
                                        * 100 * c["iv"], 3),
                    stale_pct=round(float(eng._stale_frac(eng.state))
                                    * 100, 4),
                    wd=int(getattr(eng, "watchdog_events", 0)))
                of_prev = of
        except Exception:
            log(stage="horizon_error", tag=c["tag"],
                err=traceback.format_exc()[-400:])
    log(stage="done")
except Exception:
    log(stage="error", err=traceback.format_exc()[-800:])
