#!/bin/bash
# Round-5 queue C: waits for queue B, then the 32M attempt-3 probe
# (squarer world + raised VMEM limit — see tpu_probe_32m_b.py).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
mkdir -p docs/probes_r5
if [ -f /tmp/queue_r5b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5b.pid)" 2>/dev/null; do sleep 30; done
fi
echo "queue B done $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_32m_b.py \
  >> /tmp/probe_32m_b.log 2>&1
echo "32m_b done rc=$? $(date)"
cp -f /tmp/tpu_probe_32m_b.jsonl docs/probes_r5/ 2>/dev/null
echo "queue r5c ALL DONE $(date)"
