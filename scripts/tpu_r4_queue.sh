#!/bin/bash
# Round-4 probe queue: the three armed-but-never-run round-3 probes, in
# sequence, behind a bounded liveness ping (a wedged first request is
# never resent by JAX; a fresh process is the only honest retry).
# A BACKGROUND COPIER lands partial JSONLs in docs/probes_r4/ every
# 5 min so the driver's round-end commit captures whatever completed
# (round-3 advisor finding: the copier must run DURING the queue, not
# after it).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
( while true; do
    cp -f /tmp/tpu_probe_gs_rebuild.jsonl /tmp/tpu_probe_prod_rebuild.jsonl \
          /tmp/tpu_probe_preview.jsonl docs/probes_r4/ 2>/dev/null
    sleep 300
  done ) &
COPIER=$!
trap "kill $COPIER 2>/dev/null" EXIT
while true; do
  if JAX_PLATFORMS=axon python scripts/tpu_wait_alive.py 900 \
      >> /tmp/queue_r4_ping.log 2>&1; then
    echo "runtime ALIVE $(date)"; break
  fi
  echo "still wedged $(date)"; sleep 120
done
echo "launching gs_rebuild $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_gs_rebuild.py >> /tmp/probe_gs_rebuild.log 2>&1
echo "gs_rebuild done rc=$? $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_prod_rebuild.py >> /tmp/probe_prod_rebuild.log 2>&1
echo "prod_rebuild done rc=$? $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_preview.py >> /tmp/probe_preview.log 2>&1
echo "preview done rc=$? $(date)"
cp -f /tmp/tpu_probe_gs_rebuild.jsonl /tmp/tpu_probe_prod_rebuild.jsonl \
      /tmp/tpu_probe_preview.jsonl docs/probes_r4/ 2>/dev/null
echo "queue r4 ALL DONE $(date)"
