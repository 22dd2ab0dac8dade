#!/bin/bash
# Follow-on to tpu_r4_queue_s2.sh: wait for the main queue bash to EXIT
# (completion OR a terminal failure of its last stage), then run the
# 512k rebuild@480 long-horizon adoption probe.  If the main queue's
# final gs_rebuild stage wedges forever, this never fires — acceptable:
# one TPU process at a time is the hard rule.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
if [ -f /tmp/queue_s2.pid ]; then
  while kill -0 "$(cat /tmp/queue_s2.pid)" 2>/dev/null; do sleep 30; done
fi
echo "main queue exited $(date)"
( while true; do
    cp -f /tmp/tpu_probe_s480h.jsonl docs/probes_r4/ 2>/dev/null
    sleep 300
  done ) &
COPIER=$!
trap "kill $COPIER 2>/dev/null" EXIT
JAX_PLATFORMS=axon python scripts/tpu_probe_512k_s480_horizon.py \
  >> /tmp/probe_s480h.log 2>&1
echo "s480 horizon done rc=$? $(date)"
cp -f /tmp/tpu_probe_s480h.jsonl docs/probes_r4/ 2>/dev/null
echo "queue s2b ALL DONE $(date)"
