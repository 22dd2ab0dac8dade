#!/bin/bash
# Round-2 post-relay TPU runbook: waits for the relay, then runs the
# pending hardware work IN SEQUENCE (one TPU process at a time):
#   1. tpu_sweep_iv2.py     — interval/cap refinement for the bench picks
#   2. tpu_probe_gsrank.py  — GS rank v2 (selection network) vs minloop
#   3. tpu_probe_uniform.py — uniform-radius sweep vs general
#   4. tpu_probe_gsmx.py    — GS mx layout vs flat + raw-f32 exactness
#   5. bench.py             — full 8-size curve with the (current) picks
# Logs under /tmp; JSONL results under /tmp/tpu_*.jsonl + /tmp/bench_r2.json.
#
# Run: nohup bash scripts/tpu_r2_runbook.sh > /tmp/runbook.log 2>&1 &

set -u
cd /root/repo
export JAX_PLATFORMS=axon
export PYTHONPATH="/root/repo:${PYTHONPATH:-}:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/tmp/gpe_tpu_jax_cache

echo "[runbook] waiting for relay on :8082..."
while ! ss -tln 2>/dev/null | grep -q 8082; do sleep 60; done
echo "[runbook] relay up at $(date)"

# wait out any pre-existing TPU-attached python (one process at a time);
# never kill it (wedges the remote runtime)
while ps -eo pid,args | grep -E "python.*(tpu_sweep|tpu_probe|bench\.py)" \
      | grep -v grep | grep -qv runbook; do
  echo "[runbook] another TPU process is alive; waiting 120s"
  sleep 120
done

# relay sanity ping: fetch one scalar with a bounded-work script
# (timeout only here: a hung ping means the runtime is already wedged)
timeout 300 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
v = float(jnp.ones(8).sum())
print(f"[runbook] ping ok ({v}) in {time.time()-t0:.1f}s", flush=True)
EOF
if [ $? -ne 0 ]; then echo "[runbook] ping FAILED; aborting"; exit 1; fi

echo "[runbook] === 1/5 sweep_iv2 ==="
python scripts/tpu_sweep_iv2.py > /tmp/sweep_iv2_rb.log 2>&1
echo "[runbook] sweep_iv2 done rc=$?"

echo "[runbook] === 2/5 probe_gsrank ==="
python scripts/tpu_probe_gsrank.py > /tmp/probe_gsrank_rb.log 2>&1
echo "[runbook] probe_gsrank done rc=$?"

echo "[runbook] === 3/5 probe_uniform ==="
python scripts/tpu_probe_uniform.py > /tmp/probe_uniform_rb.log 2>&1
echo "[runbook] probe_uniform done rc=$?"

echo "[runbook] === 4/5 probe_gsmx ==="
python scripts/tpu_probe_gsmx.py > /tmp/probe_gsmx_rb.log 2>&1
echo "[runbook] probe_gsmx done rc=$?"

echo "[runbook] === 5/5 bench ==="
python bench.py > /tmp/bench_r2.json 2>/tmp/bench_r2.err
echo "[runbook] bench done rc=$?"
tail -1 /tmp/bench_r2.json
echo "[runbook] ALL DONE at $(date)"

echo "[runbook] === 6/7 probe_newton ==="
python scripts/tpu_probe_newton.py > /tmp/probe_newton_rb.log 2>&1
echo "[runbook] probe_newton done rc=$?"

# stage 7 (conditional): iv3 geometry refinement under tiled_newton, only
# when the probe cross-checks AND wins at both measured sizes.  Pure-JSON
# parse — no jax import (the axon plugin registers even on CPU).
NEWTON_GO=$(python - <<'EOF'
import json
rows = [json.loads(l) for l in open("/tmp/tpu_probe_newton.jsonl")]
ok = any(r.get("stage") == "done" and r.get("xcheck_ok") for r in rows)
ms = {(r["n"], r["newton"]): r["ms"] for r in rows if r.get("stage") == "step"}
wins = [ms.get((n, True), 9e9) < ms.get((n, False), 0)
        for n in (4_194_304, 1_048_576)]
print("yes" if ok and all(wins) else "no")
EOF
)
if [ "$NEWTON_GO" = "yes" ]; then
  echo "[runbook] === 7/7 sweep_iv3 (newton won) ==="
  python scripts/tpu_sweep_iv3.py > /tmp/sweep_iv3_rb.log 2>&1
  echo "[runbook] sweep_iv3 done rc=$?"
else
  echo "[runbook] stage 7 skipped (newton_go=$NEWTON_GO)"
fi
echo "[runbook] RUNBOOK COMPLETE at $(date)"
