#!/bin/bash
# Session-4 queue, stage B: wait for queue stage A (prod_rebuild; pid in
# /tmp/queue.pid) to exit, then run the preview-scale interactive probe.
cd /root/repo
PID=$(cat /tmp/queue.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
fi
echo "queue A done; launching preview probe $(date)"
JAX_PLATFORMS=axon PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site \
  python scripts/tpu_probe_preview.py >> /tmp/probe_preview.log 2>&1
echo "preview done rc=$? $(date)"
