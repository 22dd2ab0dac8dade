#!/bin/bash
# Round-5 TPU queue.  One TPU process at a time, most valuable first:
#   1. gs_bands probe      — the sectioned-rebuild verdict (VERDICT #2)
#   2. 512k s480 horizon   — the queued round-4 adoption bar (VERDICT #3)
#   3. quality r5 probe    — 100k cap10 / 3M candidates (VERDICT #4)
#   4. 32M cap6 retry      — the queued round-4 scaling probe (VERDICT #3)
#   5. bench.py full run   — driver-grade curve on the warmed cache (VERDICT #5)
# Partial JSONLs land in docs/probes_r5/ every 5 min DURING the run.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
mkdir -p docs/probes_r5
( while true; do
    cp -f /tmp/tpu_probe_gs_bands.jsonl /tmp/tpu_probe_s480h.jsonl \
          /tmp/tpu_probe_quality_r5.jsonl /tmp/tpu_probe_32m.jsonl \
          docs/probes_r5/ 2>/dev/null
    sleep 300
  done ) &
COPIER=$!
trap "kill $COPIER 2>/dev/null" EXIT

JAX_PLATFORMS=axon python scripts/tpu_probe_gs_bands.py \
  >> /tmp/probe_gs_bands.log 2>&1
echo "gs_bands done rc=$? $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_512k_s480_horizon.py \
  >> /tmp/probe_s480h.log 2>&1
echo "s480h done rc=$? $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_quality_r5.py \
  >> /tmp/probe_quality_r5.log 2>&1
echo "quality_r5 done rc=$? $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_32m.py \
  >> /tmp/probe_32m.log 2>&1
echo "32m done rc=$? $(date)"

BENCH_DEADLINE_S=5400 JAX_PLATFORMS=axon python bench.py \
  > /tmp/bench_r5_run1.log 2>&1
echo "bench done rc=$? $(date)"
cp -f /tmp/bench_partial.json docs/probes_r5/bench_partial_run1.json 2>/dev/null

cp -f /tmp/tpu_probe_gs_bands.jsonl /tmp/tpu_probe_s480h.jsonl \
      /tmp/tpu_probe_quality_r5.jsonl /tmp/tpu_probe_32m.jsonl \
      docs/probes_r5/ 2>/dev/null
echo "queue r5 ALL DONE $(date)"
