#!/bin/bash
# Session-5 probe queue: poll the runtime with a BOUNDED self-exiting
# ping (the wedged first ping may never return — JAX does not resend
# black-holed compile requests; a fresh process can succeed once the
# runtime recovers).  When a ping succeeds, run the probes in sequence.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH:/root/.axon_site
while true; do
  if JAX_PLATFORMS=axon python scripts/tpu_wait_alive.py 240 \
      >> /tmp/queue_s5_ping.log 2>&1; then
    echo "runtime ALIVE $(date)"; break
  fi
  echo "still wedged $(date)"; sleep 120
done
echo "launching gs_rebuild $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_gs_rebuild.py >> /tmp/probe_gs_rebuild.log 2>&1
echo "gs_rebuild done rc=$? $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_prod_rebuild.py >> /tmp/probe_prod_rebuild.log 2>&1
echo "prod_rebuild done rc=$? $(date)"
JAX_PLATFORMS=axon python scripts/tpu_probe_preview.py >> /tmp/probe_preview.log 2>&1
echo "preview done rc=$? $(date)"
cp -f /tmp/tpu_probe_gs_rebuild.jsonl /tmp/tpu_probe_prod_rebuild.jsonl \
      /tmp/tpu_probe_preview.jsonl docs/probes_r3/ 2>/dev/null
echo "queue s5 ALL DONE $(date)"
