#!/bin/bash
# Round-5 queue E: waits for queue D, then the 512k drain 21k-horizon
# adoption probe.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
mkdir -p docs/probes_r5
if [ -f /tmp/queue_r5d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5d.pid)" 2>/dev/null; do sleep 30; done
fi
echo "queue D done $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_512k_drain_horizon.py \
  >> /tmp/probe_512k_drain.log 2>&1
echo "512k_drain done rc=$? $(date)"
cp -f /tmp/tpu_probe_512k_drain.jsonl docs/probes_r5/ 2>/dev/null
echo "queue r5e ALL DONE $(date)"
