#!/bin/bash
# Session-4 probe queue: wait for the running gs_rebuild probe (pid in
# /tmp/probe.pid) to exit, then run the production-path rebuild probe.
cd /root/repo
PID=$(cat /tmp/probe.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "gs_rebuild probe done; launching prod_rebuild $(date)"
JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  python scripts/tpu_probe_prod_rebuild.py >> /tmp/probe_prod_rebuild.log 2>&1
echo "prod_rebuild done rc=$? $(date)"
