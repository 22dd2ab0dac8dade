"""Per-pallas-launch overhead at the production geometry: K sequential
trivial band kernels in one jit, K = 1, 3, 6."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_launch.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cap, TY, TX = 8, 640, 1850  # production 4M geometry (mult 3.3, cap 8)
BAND = 8
nb = TY // BAND

def copy_kernel(src, dst):
    dst[...] = src[...] + 1.0

spec = pl.BlockSpec((cap, BAND, TX), lambda i: (0, i, 0),
                    memory_space=pltpu.VMEM)

def k_pass(x):
    return pl.pallas_call(
        copy_kernel, grid=(nb,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((cap, TY, TX), jnp.float32),
    )(x)

x0 = jnp.zeros((cap, TY, TX), jnp.float32)
for K in (1, 3, 6):
    try:
        def fn(x, K=K):
            for _ in range(K):
                x = k_pass(x)
            return x
        f = jax.jit(fn)
        out = f(x0)
        float(out[0, 0, 0])
        t0 = time.perf_counter()
        o = x0
        for _ in range(10):
            o = f(o)
        float(o[0, 0, 0])
        log(stage=f"launches_{K}",
            ms=round((time.perf_counter() - t0) / 10 * 1e3, 3))
    except Exception:
        log(stage=f"launches_{K}", error=traceback.format_exc()[-500:])
log(stage="done")
