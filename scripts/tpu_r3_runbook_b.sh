#!/bin/bash
# round-3 runbook stage B: fused-integrate verification + stacked GS
# timings, then a full local bench.py validation run (exercises the new
# frame_ms / render_ms / variants / gs rows before the driver does).
cd /root/repo
export JAX_PLATFORMS=axon
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
python scripts/tpu_probe_gs_opt2.py >> /tmp/probe_gs_opt2.log 2>&1
echo "gs_opt2 done rc=$?"
python bench.py > /tmp/bench_r3_local.json 2> /tmp/bench_r3_local.log
echo "bench done rc=$?"
echo "R3 RUNBOOK STAGE-B DONE"
