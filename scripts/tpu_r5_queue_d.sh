#!/bin/bash
# Round-5 queue D (replaces the killed B/C chain): ping-gate until the
# runtime recovers from the probe kill, then
#   1. gs_bands3 — clean drain/capacity verdicts (watchdog off)
#   2. 32m attempt 3 (squarer world / raised VMEM)
#   3. bench re-run — validates the first-touch degraded fix + the
#      full curve with the adopted 100k cap10 row
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
mkdir -p docs/probes_r5
( while true; do
    cp -f /tmp/tpu_probe_gs_bands3.jsonl /tmp/tpu_probe_32m_b.jsonl \
          docs/probes_r5/ 2>/dev/null
    sleep 300
  done ) &
COPIER=$!
trap "kill $COPIER 2>/dev/null" EXIT

# ping-gate: a killed TPU process wedges the runtime 20-40 min; a
# fresh probe launched into the wedge can black-hole its first compile
# (JAX never resends).  Ping until a scalar fetch is fast.
for i in $(seq 1 30); do
  timeout 300 env JAX_PLATFORMS=axon python scripts/tpu_ping.py \
    > /tmp/ping_gate.log 2>&1
  if grep -q '"value": 1048576.0' /tmp/ping_gate.log; then
    echo "ping ok (attempt $i) $(date)"
    break
  fi
  echo "ping attempt $i failed, waiting $(date)"
  sleep 120
done

JAX_PLATFORMS=axon python scripts/tpu_probe_gs_bands3.py \
  >> /tmp/probe_gs_bands3.log 2>&1
echo "gs_bands3 done rc=$? $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_32m_b.py \
  >> /tmp/probe_32m_b.log 2>&1
echo "32m_b done rc=$? $(date)"

BENCH_DEADLINE_S=5400 JAX_PLATFORMS=axon python bench.py \
  > /tmp/bench_r5_run2.log 2>&1
echo "bench2 done rc=$? $(date)"
cp -f /tmp/bench_partial.json docs/probes_r5/bench_partial_run2.json 2>/dev/null

cp -f /tmp/tpu_probe_gs_bands3.jsonl /tmp/tpu_probe_32m_b.jsonl \
      docs/probes_r5/ 2>/dev/null
echo "queue r5d ALL DONE $(date)"
