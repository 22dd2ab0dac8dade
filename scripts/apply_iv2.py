"""Digest the round-2 interval sweeps into TUNED_TILE_GEOMETRY picks.

Reads /tmp/tpu_sweep_iv.jsonl + /tmp/tpu_sweep_iv2.jsonl (the hardware
sweeps over (mult, cap, chunk, match, interval) per size) and, per size,
picks the fastest row whose DEFERRED POPULATION (defer_pct x interval —
the physics-quality metric, PERF.md "Relocate interval") stays within
the ~1%/step bound.  Prints a ready-to-paste TUNED_TILE_GEOMETRY dict
next to the current one, flagging changed rows.

Pure stdlib on purpose: runs instantly on the 1-core box with no JAX
import, safe to run while a TPU process is alive.

Run: python scripts/apply_iv2.py [--bound 1.0] [extra.jsonl ...]
"""

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

QUALITY_BOUND_DEFAULT = 1.0   # deferred population %/step
SLACK = 1.15                  # rows within 15% of the bound are shown
                              # as near-miss alternatives, never picked

FILES = ["/tmp/tpu_sweep_iv.jsonl", "/tmp/tpu_sweep_iv2.jsonl"]


def load_rows(paths):
    rows = []
    for path in paths:
        try:
            with open(path) as fh:
                for line in fh:
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if d.get("stage") not in ("iv_sweep", "iv2"):
                        continue
                    if "ms_per_step" not in d:
                        continue
                    d.setdefault("match", "greedy")
                    d["quality"] = d.get(
                        "defer_per_event",
                        d["defer_pct"] * d.get("interval", 1))
                    rows.append(d)
        except FileNotFoundError:
            print(f"[skip] {path} not found", file=sys.stderr)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bound", type=float, default=QUALITY_BOUND_DEFAULT)
    ap.add_argument("--newton", action="store_true",
                    help="digest tiled_newton sweep rows instead")
    ap.add_argument("extra", nargs="*", help="additional jsonl files")
    args = ap.parse_args()

    rows = load_rows(FILES + list(args.extra))
    if not rows:
        print("no sweep rows found; did the runbook run?", file=sys.stderr)
        return 1

    # Newton-sweep rows (tpu_sweep_iv3.py) time a kernel bench.py only
    # runs when tiled_newton is flipped on — never let them compete with
    # standard-sweep rows for the same picks table.  Digest them with
    # --newton (and only adopt those picks together with the bench flip).
    newton_rows = [d for d in rows if d.get("newton")]
    rows = [d for d in rows if not d.get("newton")]
    if args.newton:
        rows = newton_rows
        print("(newton-sweep rows only — adopt together with "
              "tiled_newton=True in bench.py)\n")
    elif newton_rows:
        print(f"[note] {len(newton_rows)} newton rows excluded; "
              "re-run with --newton to digest them\n")

    from gpu_physics_engine_tpu.core.tuned import TUNED_TILE_GEOMETRY

    by_n = {}
    for d in rows:
        by_n.setdefault(d["n"], []).append(d)

    picks = {}
    print(f"quality bound: deferred population <= {args.bound}%/step\n")
    for n in sorted(by_n):
        cand = sorted(by_n[n], key=lambda d: d["ms_per_step"])
        ok = [d for d in cand if d["quality"] <= args.bound]
        near = [d for d in cand
                if args.bound < d["quality"] <= args.bound * SLACK]
        print(f"== n={n:,}")
        for d in cand[:6]:
            tag = ("PICK" if ok and d is ok[0] else
                   "ok  " if d in ok else
                   "near" if d in near else "q!  ")
            print(f"  {tag} mult={d['mult']:<5} cap={d['cap']:<2} "
                  f"chunk={d['chunk']:<3} match={d['match']:<6} "
                  f"iv={d.get('interval', 1)}  "
                  f"{d['ms_per_step']:7.3f} ms  "
                  f"q={d['quality']:5.2f}%  "
                  f"x{d.get('vs_baseline', float('nan')):.2f}"
                  + ("  uniform" if d.get("uniform") else ""))
        if ok:
            b = ok[0]
            picks[n] = (b["mult"], b["cap"], b["chunk"], b["match"],
                        b.get("interval", 1))
        else:
            print("  !! no row meets the bound — keep current, needs "
                  "another sweep (+1 cap or -interval)")
        print()

    print("# ready to paste (changed rows marked):")
    print("TUNED_TILE_GEOMETRY = {")
    for n in sorted(set(TUNED_TILE_GEOMETRY) | set(picks)):
        cur = TUNED_TILE_GEOMETRY.get(n)
        row = picks.get(n, cur)
        mark = ""
        if n not in picks:
            mark = "  # unswept: kept current"
        elif cur is not None and tuple(row) != tuple(cur):
            mark = f"  # CHANGED from {cur}"
        print(f"    {n:_}: {tuple(row)!r},{mark}")
    print("}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
