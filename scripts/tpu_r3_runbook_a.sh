#!/bin/bash
# round-3 runbook stage A: gs optimization matrix -> 20k-step horizon
# locks -> interactive session.  One TPU process at a time; each stage
# logs its own JSONL under /tmp.
cd /root/repo
export JAX_PLATFORMS=axon
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
python scripts/tpu_probe_gs_opt.py >> /tmp/probe_gs_opt.log 2>&1
echo "gs_opt done rc=$?"
python scripts/tpu_probe_horizon20k.py >> /tmp/probe_h20k.log 2>&1
echo "horizon20k done rc=$?"
python scripts/tpu_probe_interactive.py >> /tmp/probe_interactive.log 2>&1
echo "interactive done rc=$?"
echo "R3 RUNBOOK STAGE-A DONE"
