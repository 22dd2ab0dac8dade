"""Tiny TPU liveness ping: compile + fetch one scalar, print timing."""
import json, time, os, sys
t0 = time.time()
import jax, jax.numpy as jnp
t1 = time.time()
d = jax.devices()
t2 = time.time()
x = jax.jit(lambda a: (a * 2.0 + 1.0).sum())(jnp.arange(1024, dtype=jnp.float32))
v = float(x)
t3 = time.time()
print(json.dumps({"import_s": round(t1-t0,2), "devices_s": round(t2-t1,2),
                  "compile_fetch_s": round(t3-t2,2), "value": v,
                  "dev": str(d[0])}), flush=True)
