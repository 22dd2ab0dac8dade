"""Digest ALL round-2 hardware probe JSONLs into config-default decisions.

Companion to apply_iv2.py (which handles the TUNED_TILE_GEOMETRY picks);
this one reads the kernel-variant probes and prints, per decision, the
measured numbers and the exact edit to make:

  /tmp/tpu_probe_gsrank.jsonl  -> gs_rank   "auto": minloop vs net
  /tmp/tpu_probe_gsmx.jsonl    -> gs_layout "auto": flat vs mx,
                                  gs_mx_split (raw_f32_onehot_exact)
  /tmp/tpu_probe_uniform.jsonl -> tiled_uniform_radius speedup (bench
                                  already enables it; informational)
  /tmp/tpu_probe_newton.jsonl  -> tiled_newton default + bench enable

Pure stdlib on purpose: runs instantly on the 1-core box with no JAX
import, safe to run while a TPU process is alive.

Run: python scripts/apply_probes.py
"""

import json


def rows(path):
    try:
        with open(path) as fh:
            out = []
            for line in fh:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
            return out
    except FileNotFoundError:
        print(f"[missing] {path}")
        return []


def latest(rs, stage, **match):
    """Last row of a stage matching the given fields (probes append)."""
    hits = [r for r in rs if r.get("stage") == stage
            and all(r.get(k) == v for k, v in match.items())]
    return hits[-1] if hits else None


def decide(name, cond, edit_true, edit_false="no change"):
    print(f"  -> {edit_true if cond else edit_false}"
          + (f"   [{name}]" if name else ""))


print("== gs_rank (minloop vs net selection network) ==")
rs = rows("/tmp/tpu_probe_gsrank.jsonl")
if rs:
    a = latest(rs, "gs_flat", impl="minloop")
    b = latest(rs, "gs_flat", impl="net")
    par = latest(rs, "rank_parity_hw")
    if a and b:
        print(f"  flat engine-step: minloop {a['ms']} ms, net {b['ms']} ms;"
              f" parity {par and par.get('chains_equal')}")
        win = b["ms"] < a["ms"] and bool(par and par.get("chains_equal"))
        decide("", win,
               "config.py _rank auto: flip gs_rank auto->net",
               "keep gs_rank auto->minloop")
    else:
        print("  incomplete rows:", [r.get("stage") for r in rs][-6:])

print("== gs_layout (flat vs mx) + gs_mx_split ==")
rs = rows("/tmp/tpu_probe_gsmx.jsonl")
if rs:
    f = latest(rs, "gs_flat")
    m = latest(rs, "gs_mx")
    ns = latest(rs, "gs_mx_nosplit")
    par = latest(rs, "gs_parity_hw")
    ex = latest(rs, "raw_f32_onehot_exact")
    ef = latest(rs, "gs_engine_flat")
    em = latest(rs, "gs_engine_mx")
    if f and m:
        print(f"  solver-only: flat {f['ms']} ms, mx {m['ms']} ms"
              + (f", mx-nosplit {ns['ms']} ms" if ns else "")
              + f"; parity {par and par.get('chains_equal')}")
    if ef and em:
        print(f"  engine-step: flat {ef.get('ms_per_step')} ms,"
              f" mx {em.get('ms_per_step')} ms")
    # the nosplit variant is only adoptable if BOTH its one-hot
    # exactness probe and its own chain parity passed
    ns_ok = (ns is not None and bool(ns.get("chains_equal"))
             and bool(ex and ex.get("exact")))
    if ex is not None:
        print(f"  raw-f32 one-hot exact: {ex.get('exact')}"
              f" (precision={ex.get('precision')});"
              f" nosplit parity {ns and ns.get('chains_equal')}")
        decide("", ns_ok,
               "config.py: gs_mx_split default True -> False"
               " (halves the relayout matmuls)",
               "keep gs_mx_split=True")
    candidates = [r["ms"] for r in ((m,) + ((ns,) if ns_ok else ()))
                  if r]
    best_mx = min(candidates or [float("inf")])
    if f and best_mx < float("inf"):
        decide("", best_mx < f["ms"]
               and bool(par and par.get("chains_equal")),
               "config.py _layout auto: flip gs_layout auto->mx",
               "keep gs_layout auto->flat")

print("== tiled_uniform_radius (bench already enables; informational) ==")
rs = rows("/tmp/tpu_probe_uniform.jsonl")
for n in (4_194_304, 1_048_576):
    a = latest(rs, "step", n=n, uniform=False)
    b = latest(rs, "step", n=n, uniform=True)
    if a and b:
        print(f"  n={n}: general {a['ms']} ms -> uniform {b['ms']} ms"
              f" ({a['ms'] / b['ms']:.2f}x), deferred"
              f" {b.get('deferred_population_pct')}%/step")

print("== tiled_newton (pair-once sweep) ==")
rs = rows("/tmp/tpu_probe_newton.jsonl")
if rs:
    xc = latest(rs, "xcheck")
    print(f"  hardware xcheck: {xc}")
    wins = []
    for n in (4_194_304, 1_048_576):
        a = latest(rs, "step", n=n, newton=False)
        b = latest(rs, "step", n=n, newton=True)
        if a and b:
            print(f"  n={n}: standard {a['ms']} ms -> newton {b['ms']} ms"
                  f" ({a['ms'] / b['ms']:.2f}x), deferred"
                  f" {b.get('deferred_population_pct')}%/step")
            wins.append(b["ms"] < a["ms"])
    ok = bool(xc and xc.get("ok")) and wins and all(wins)
    decide("", ok,
           "bench.py: pass tiled_newton=True (with fallback) +"
           " consider re-sweeping geometry picks (cheaper sweep may"
           " prefer higher caps)",
           "keep tiled_newton=False")

print("\n(geometry picks: python scripts/apply_iv2.py)")
