#!/bin/bash
# Round-4 session-2 TPU queue.  One TPU process at a time:
#   (running) bench.py warm-up            -> /tmp/bench_warm1.log
#   1. fused-frame fps probe              -> /tmp/tpu_probe_fused_frame.jsonl
#   2. 512k rebuild-geometry re-sweep     -> /tmp/tpu_probe_512k.jsonl
#   3. 32M scaling probe                  -> /tmp/tpu_probe_32m.jsonl
#   4. bench.py again (cache warm => full curve) -> /tmp/bench_warm2.log
#   5. gs_rebuild 4M probe LAST (the workload class that black-holed the
#      compile service 4x — nothing may queue behind it)
# Partial JSONLs land in docs/probes_r4/ every 5 min DURING the run.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
( while true; do
    cp -f /tmp/tpu_probe_fused_frame.jsonl /tmp/tpu_probe_512k.jsonl \
          /tmp/tpu_probe_32m.jsonl \
          /tmp/tpu_probe_gs_rebuild.jsonl docs/probes_r4/ 2>/dev/null
    sleep 300
  done ) &
COPIER=$!
trap "kill $COPIER 2>/dev/null" EXIT

# wait for the in-flight bench warm-up (pid file) to exit
if [ -f /tmp/bench_warm.pid ]; then
  while kill -0 "$(cat /tmp/bench_warm.pid)" 2>/dev/null; do sleep 20; done
fi
echo "bench warm-up done $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_fused_frame.py \
  >> /tmp/probe_fused_frame.log 2>&1
echo "fused_frame done rc=$? $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_512k_rebuild.py \
  >> /tmp/probe_512k.log 2>&1
echo "512k done rc=$? $(date)"

JAX_PLATFORMS=axon python scripts/tpu_probe_32m.py \
  >> /tmp/probe_32m.log 2>&1
echo "32m done rc=$? $(date)"

BENCH_DEADLINE_S=5400 JAX_PLATFORMS=axon python bench.py \
  > /tmp/bench_warm2.log 2>&1
echo "bench2 done rc=$? $(date)"
cp -f /tmp/bench_partial.json docs/probes_r4/bench_partial_s2.json 2>/dev/null

JAX_PLATFORMS=axon python scripts/tpu_probe_gs_rebuild.py \
  >> /tmp/probe_gs_rebuild.log 2>&1
echo "gs_rebuild done rc=$? $(date)"
cp -f /tmp/tpu_probe_fused_frame.jsonl /tmp/tpu_probe_512k.jsonl \
      /tmp/tpu_probe_gs_rebuild.jsonl docs/probes_r4/ 2>/dev/null
echo "queue r4 s2 ALL DONE $(date)"
