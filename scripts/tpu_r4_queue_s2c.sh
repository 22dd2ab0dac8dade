#!/bin/bash
# Third follow-on: wait for queue s2b to exit, then retry the 32M probe
# with the cap-6 memory fix (first attempt OOM'd at cap 8: ~6.3 GB of
# scoped full-geometry temporaries in a relocate fusion).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
if [ -f /tmp/queue_s2b.pid ]; then
  while kill -0 "$(cat /tmp/queue_s2b.pid)" 2>/dev/null; do sleep 30; done
fi
echo "s2b exited $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_32m.py \
  >> /tmp/probe_32m.log 2>&1
echo "32m retry done rc=$? $(date)"
cp -f /tmp/tpu_probe_32m.jsonl docs/probes_r4/ 2>/dev/null
echo "queue s2c ALL DONE $(date)"
