#!/bin/bash
# Round-5 queue B: waits for queue A (pid file /tmp/queue_r5.pid), then
# runs the drain-semantics band verdict (attempt 2 — attempt 1's
# wholesale-per-band semantics measured negative mid-queue and was
# replaced by the drain in ops/tiled.rebuild_band).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
mkdir -p docs/probes_r5
if [ -f /tmp/queue_r5.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "queue A done $(date)"
( while true; do
    cp -f /tmp/tpu_probe_gs_bands2.jsonl docs/probes_r5/ 2>/dev/null
    sleep 300
  done ) &
COPIER=$!
trap "kill $COPIER 2>/dev/null" EXIT

JAX_PLATFORMS=axon python scripts/tpu_probe_gs_bands2.py \
  >> /tmp/probe_gs_bands2.log 2>&1
echo "gs_bands2 done rc=$? $(date)"
cp -f /tmp/tpu_probe_gs_bands2.jsonl docs/probes_r5/ 2>/dev/null
echo "queue r5b ALL DONE $(date)"
