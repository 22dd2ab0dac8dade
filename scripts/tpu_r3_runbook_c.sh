#!/bin/bash
# round-3 runbook stage C: wait for stage B, then verify + time the
# mega colors kernel.
while ! grep -q "R3 RUNBOOK STAGE-B DONE" /tmp/runbook_r3b.log 2>/dev/null; do
  sleep 30
done
cd /root/repo
export JAX_PLATFORMS=axon
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
python scripts/tpu_probe_gs_mega.py >> /tmp/probe_gs_mega.log 2>&1
echo "gs_mega done rc=$?"
echo "R3 RUNBOOK STAGE-C DONE"
