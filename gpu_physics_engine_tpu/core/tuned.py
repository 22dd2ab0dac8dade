"""Hardware-swept production tile geometry per particle count.

The reference publishes one frame-time row per size (100k..4M,
/root/reference/README.md:80-87) with a single engine configuration; the
tiled TPU pipeline instead has a per-size optimum (tile multiplier, cap,
scan chunk, relocate matching, relocate interval) found by the round-2
hardware sweeps on a TPU v5e chip (scripts/tpu_sweep_curve*.py,
tpu_sweep_iv*.py; method + full tables in PERF.md).  This module is the
single source of truth: bench.py and user code both read it.

Quality rule actually ENFORCED per row (PERF.md "quality rule"; the
round-4 verdict asked for the bound text to match reality): a row is
adopted only if, over a long horizon (>= 12 x 480-step windows; 21k
steps for contested picks), it is (a) watchdog-free, (b) its deferred
population is NON-ACCELERATING, and (c) its stale-pair equilibrium is
bounded and not growing.  DEFERRED POPULATION (deferral rate x
relocate interval) lands at or near ~1%/step for most rows, but that
number is a tuning target, not the gate: 3M settles at ~3.6% deferred
/ ~1.2% stale (dancers + granular-clustering latency — the 21k-step
probe tpu_probe_horizon20k; re-confirmed round 5).  100k's old
cluster-overflow residue (1.56%/1.57% at cap 8) was capacity-bound:
the adopted cap-10 row runs 0.29%/0.35% (tpu_probe_quality_r5).
bench.py flags any row whose deferred/stale exceeds the documented
per-row expectation (quality_note) so regressions are loud.

The rows track the reference curve's DENSITY: n particles of radius ~0.5
in the fixed 3048x1048 world (2.5% area fill at 100k up to ~100% packed
at 4M).  The coarse multipliers at small n (22.0 at 100k) are only sane
at that sparsity — if your world/radius density differs a lot, treat the
nearest row as a starting point and re-sweep.
"""

from __future__ import annotations

from typing import Optional

from gpu_physics_engine_tpu.core.config import SimConfig

# Newton's-third-law sweep (SimConfig.tiled_newton): hardware-verified
# (scripts/tpu_probe_newton.py, v5e): bit-identical to the standard
# sweep at 64k/8 steps (dx=dy=0.0) and wins 24-31% — 4M 5.04 -> 3.84
# ms/step, 1M 2.19 -> 1.67.  Geometry rows re-tuned under the cheaper
# sweep by scripts/tpu_sweep_iv3.py.
TUNED_NEWTON = True

# n_particles -> (tile_multiplier, tile_cap, run chunk, tiled_match,
#                 tiled_relocate_interval)
# rows re-swept under tiled_newton + tiled_uniform_radius
# (scripts/tpu_sweep_iv3.py; ms / vs-baseline / deferred population)
TUNED_TILE_GEOMETRY = {
    # 100k cap 8 -> 10 (round-5 quality probe, docs/probes_r5/
    # tpu_probe_quality_r5.jsonl): +0.1 ms buys stale 1.57 -> 0.35%
    # and deferred 1.56 -> 0.29% — the coarse-tile cluster-overflow
    # residue WAS capacity-bound (cap12 pins it at 0.07% for another
    # +0.14 ms; cap10 is the knee).
    100_000: (22.0, 10, 128, "greedy", 2),  # 0.600 ms 1.72x @0.29%
    256_000: (12.1, 9, 128, "greedy", 2),   # 0.847 ms 1.51x @0.70% (iv3)
    512_000: (6.6, 7, 128, "greedy", 4),    # 1.072 ms 1.75x @1.06% (iv3)
    756_000: (4.4, 5, 32, "greedy", 4),     # 1.172 ms 2.16x @0.69% (iv4)
    1_048_576: (4.4, 6, 32, "greedy", 4),   # 1.554 ms 2.36x @0.49% (iv3)
    2_000_000: (4.4, 6, 16, "greedy", 4),   # 1.561 ms 5.39x @0.86% (iv3)
    # 3M re-tuned round 3 (scripts/tpu_probe_horizon20k.py
    # 3m_alt_mult44): 1.83 ms = 8.5x at 21k-step stability — stale-pair
    # DECLINES 1.37% -> 0.24% while deferred population holds ~3.9%
    # (dancers + clustering latency, not a jam).  Round-5 re-checks
    # (tpu_probe_quality_r5.jsonl): the old (3.3, 6) quality-max pick
    # now measures 4.6 ms (not its round-2 3.14 — the Newton/uniform
    # reworks moved the optimum) and the band drain changes nothing
    # here (stale 1.15 vs 1.18: dancers, not chains) — incumbent holds.
    3_000_000: (4.4, 6, 16, "greedy", 4),

    # 4M: the ONLY long-horizon-stable config class at this density
    # (103% nominal fill): cap8 + iv2 + hysteresis OFF (TUNED_OVERRIDES).
    # Faster configs (cap6 iv2 3.85 ms = 5.9x; cap7 iv2 5.0 ms = 4.5x)
    # all avalanche into a storage jam past ~2000 steps — probes in
    # DESIGN.md §9 "4M storage-jam".
    # greedy matching and the auto sweep budget are both load-bearing
    # here (flip2 jams at 25%; a 64k sweep budget re-grows to 6%/step —
    # scripts/tpu_probe_4m_final.py)
    4_194_304: (3.3, 8, 32, "greedy", 2),   # 6.82 ms 3.33x @0.018% stable
}


# Per-size config overrides beyond the geometry tuple — picked by the
# LONG-HORIZON stability probes (scripts/tpu_probe_jam_bisect.py,
# tpu_probe_nohyst_curve.py, tpu_probe_small_horizon.py; DESIGN.md §9
# "4M storage-jam").  The relocate hysteresis band is a per-size
# decision: at 4M (103% nominal fill) it nucleates an unbounded
# storage-jam avalanche (deferred population 1% -> 74% over 5760
# steps) and MUST be off; at the coarse-tile small sizes turning it
# off floods the matcher and jams the other way.
# Documented per-row quality expectations: (deferred_pop_pct,
# stale_pct) upper bounds = the measured long-horizon equilibrium plus
# headroom.  The adoption gate is the long-horizon rule in the module
# docstring; these make BENCH regressions loud — bench.py attaches a
# quality_note to any row exceeding its expectation.
QUALITY_EXPECTATION = {
    100_000: (0.6, 0.8),    # cap10 r5: 0.29%/0.35% measured + headroom
    256_000: (1.2, 1.5),
    512_000: (1.6, 2.8),    # rebuild-sweep class; s480/bands pending
    756_000: (1.2, 1.0),
    1_048_576: (1.0, 1.0),
    2_000_000: (1.4, 1.0),
    3_000_000: (4.5, 1.7),  # 3.48%/1.25% r4: dancers + clustering latency
    4_194_304: (1.0, 1.0),
}

TUNED_OVERRIDES = {
    # Round-4 21k-step horizon verdicts (docs/probes_r4/
    # tpu_probe_prod_rebuild.jsonl + tpu_probe_hybrid.jsonl; PERF.md
    # "The small-size sweep verdict"): the budgeted relocate sweep's
    # displacement-chain residue jams 256k (watchdog x7) and creeps
    # 512k; the hybrid (tiled_rebuild_every) still goes watchdog-
    # dependent at both (the relocate sweeps between rebuilds feed the
    # jam).  Wholesale rebuild every 240-step sweep is watchdog-free
    # at all three small sizes and costs nothing at 100k/256k
    # (rebuild 19.5/54.6 ms there; 0.330/0.846 ms/step measured vs
    # 0.326/0.725 tuned).
    100_000: dict(tiled_sweep="rebuild"),
    256_000: dict(tiled_sweep="rebuild"),  # cadence 480 probed r5s2:
    # -18% but stale crosses 1.5% in two windows (tpu_probe_256k_s480)

    512_000: dict(tiled_sweep="rebuild"),  # 1.541 ms (+44%) — the
    # stability price at this geometry (rebuild 126.9 ms: 2.05M slots);
    # hy8/hy4 both watchdog-dependent, see the probe jsonl
    4_194_304: dict(tiled_hysteresis=0.0),
}


# Reference-exact GS storage cap per size (round-3 probes
# tpu_probe_gs_curve/gs_opt): cap = measured settled occ_max + 1
# headroom.  cap is STORAGE only — cap4/K6 is bit-exact vs cap5/K6
# (capk xcheck dx=dy=0, overflow 0); K stays 6 (the reference's
# drop-past-6 membership is engaged from 256k up and IS the
# semantics).  Cost scales with cap (11.0 -> 8.7 ms @1M for 5 -> 4).
_GS_CAP = {100_000: 3, 256_000: 4, 512_000: 4, 756_000: 4,
           1_048_576: 4, 2_000_000: 5, 3_000_000: 6, 4_194_304: 6}
# 4M cap6: zero refused inserts at init, occ_max exactly 6, 13.69 ms =
# 1.66x baseline (tpu_probe_gs_opt.jsonl 4m_init/4m_time)


# extra SimConfig flags for the reference-exact GS solver.  The
# round-3 window-fused kernels (gs_colors_mega / gs_relocate_mega,
# ops/gs_mega.py) are bit-exact on hardware but MEASURED NEGATIVE in
# same-process A/B at every cap class (tpu_probe_gs_mega3: 1M 8.46 vs
# seq 8.22, 2M 10.46 vs 10.24, 4M 13.44 vs 13.26; relocate fusion
# costs +1.6 ms @1M) — so this stays EMPTY and the sequential
# per-color kernels remain the production GS path.
GS_FLAGS: dict = {}


# Reference-exact GS sweep: cadence (sort_interval_steps) + mechanism.
# At 4M (103% area fill) the stale-pair population creeps at ANY cap
# and ANY budgeted-relocate cadence (240/120/60 identical,
# docs/probes_r3/tpu_probe_gs4m_cadence.jsonl) because free-slot
# claims cannot resolve displacement chains across full tiles.  The
# wholesale rebuild would bound staleness by construction, BUT at the
# 4M GS geometry it DOES NOT COMPILE: after four black-holed attempts
# across three sessions, attempt #5 (round-4 session 2) finally got an
# answer from the compile service — an 81-minute COMPILE ERROR for the
# rebuild program at the 2.65M-cell/16M-slot GS geometry
# (docs/probes_r4/tpu_probe_gs_rebuild.jsonl stage=error
# name=rebuild_cost).  The candidate is retired on evidence; the
# default is the hardware-measured cadence-240 relocate (13.3 ms/step,
# docs/probes_r3/tpu_probe_gs4m.jsonl) with the storage-jam watchdog
# as the creep bound.
# 240/"relocate" elsewhere — stale is <= 0.03% there without help.
_GS_SWEEP: dict = {}


def GS_SWEEP(n_particles: int):
    """(sort_interval_steps, tiled_sweep) for the GS solver at n."""
    sizes = sorted(_GS_CAP)
    best = min(sizes, key=lambda s: abs(s / n_particles - 1.0)
               + abs(n_particles / s - 1.0))
    return _GS_SWEEP.get(best, (240, "relocate"))


def GS_TUNED(n_particles: int):
    """(tile_cap, tiled_match) for the reference-exact GS solver at
    this size.  flip matching is bit-exact for GS relocation
    (tpu_probe_gs_opt flip_xcheck dx=dy=0) and cheaper than flip2."""
    sizes = sorted(_GS_CAP)
    best = min(sizes, key=lambda s: abs(s / n_particles - 1.0)
               + abs(n_particles / s - 1.0))
    return _GS_CAP[best], "auto"


def tuned_overrides(n_particles: int) -> dict:
    sizes = sorted(TUNED_TILE_GEOMETRY)
    best = min(sizes, key=lambda s: abs(s / n_particles - 1.0)
               + abs(n_particles / s - 1.0))
    return dict(TUNED_OVERRIDES.get(best, {}))


def tuned_row(n_particles: int):
    """(mult, cap, chunk, match, interval) for the nearest swept size
    (log-nearest: the optimum tracks density, which scales with n)."""
    sizes = sorted(TUNED_TILE_GEOMETRY)
    best = min(sizes, key=lambda s: abs(s / n_particles - 1.0)
               + abs(n_particles / s - 1.0))
    return TUNED_TILE_GEOMETRY[best]


def tuned_config(n_particles: int, max_particles: Optional[int] = None,
                 **overrides) -> SimConfig:
    """Production tiled SimConfig at the swept geometry for this size.

    ``overrides`` go straight to SimConfig (world size, gravity, ...);
    geometry fields you pass explicitly win over the table.
    The matching run() chunk is ``tuned_chunk(n_particles)``.
    """
    mult, cap, _, match, iv = tuned_row(n_particles)
    kw = dict(pipeline="tiled", tile_multiplier=mult, tile_cap=cap,
              tiled_match=match, tiled_relocate_interval=iv,
              # benchmark-density scenes are uniform radius 0.5
              # (particle_system.rs:117); the engine falls back to the
              # general sweep if spawns break the premise
              tiled_uniform_radius=True,
              tiled_newton=TUNED_NEWTON,
              initial_particles=n_particles,
              max_particles=max_particles or n_particles)
    kw.update(tuned_overrides(n_particles))
    kw.update(overrides)
    return SimConfig(**kw)


def tuned_chunk(n_particles: int) -> int:
    """run() scan-chunk depth paired with tuned_config (small sizes
    amortize the ~5.7 ms/program tunnel floor over deeper scans)."""
    return tuned_row(n_particles)[2]
