"""Bounded TPU liveness check: exit 0 if a trivial scalar fetch completes
within the deadline, exit 1 otherwise.  ALWAYS exits (os._exit — the hung
fetch thread cannot be joined); safe to run in a retry loop while the
remote runtime is wedged (same pattern as bench.py _runtime_alive).

Default deadline matches bench.py's _RUNTIME_DEADLINE_S (900 s): the
degraded-but-recovering compile service has been observed taking
172-570 s for this trivial fetch, and aborting the process mid-request
(os._exit) is itself a wedge risk — a slow-but-alive runtime must be
counted alive, not re-aborted every retry (round-3 advisor finding)."""
import os
import sys
import threading
import time

DEADLINE_S = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
result = {}

def probe():
    import jax.numpy as jnp
    t0 = time.time()
    result["v"] = float(jnp.arange(8.0).sum())
    result["s"] = round(time.time() - t0, 1)

th = threading.Thread(target=probe, daemon=True)
th.start()
th.join(DEADLINE_S)
ok = result.get("v") == 28.0
print(f"alive={ok} fetch_s={result.get('s')}", flush=True)
os._exit(0 if ok else 1)
