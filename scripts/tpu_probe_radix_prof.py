"""Stage-by-stage profile of radix_sort_pairs at 1M on TPU."""
import json, os, time, traceback
T0 = time.time()
LOG = open("/tmp/tpu_probe_radix_prof.jsonl", "a", buffering=1)
def log(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n"); print(json.dumps(kw), flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gpe_tpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
log(stage="init", devices=str(jax.devices()))
import numpy as np
import jax.numpy as jnp
from gpu_physics_engine_tpu.ops import radix_sort as rs

n = 1 << 20
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 24, n, dtype=np.uint32))
payload = jnp.asarray(np.arange(n, dtype=np.uint32))
nblocks = n // rs.BLOCK

def timeit(name, fn, *args):
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        log(stage=name, ms=round((time.perf_counter() - t0) / 5 * 1e3, 2))
        return out
    except Exception:
        log(stage=name, error=traceback.format_exc()[-500:])

rank, hist = timeit("rank_hist_kernel", lambda k: rs._rank_hist(k, 0), keys)
timeit("hist_T_cumsum", lambda h: jnp.concatenate(
    [jnp.zeros(1, jnp.int32), jnp.cumsum(h.T.reshape(-1))[:-1]]), hist)
offsets = jnp.zeros((nblocks, rs.BINS), jnp.int32)
digits = (keys & jnp.uint32(255)).astype(jnp.int32)
block_id = jnp.arange(n, dtype=jnp.int32) // rs.BLOCK
timeit("offsets_gather", lambda o, b, d: jnp.take(
    o.reshape(-1), b * rs.BINS + d), offsets, block_id, digits)
dest = jnp.asarray(rng.permutation(n).astype(np.int32))
timeit("inv_scatter", lambda d: jnp.zeros(n, jnp.int32).at[d].set(
    jnp.arange(n, dtype=jnp.int32), unique_indices=True), dest)
timeit("two_takes", lambda k, p, i: (jnp.take(k, i), jnp.take(p, i)),
       keys, payload, dest)
timeit("one_pass_full", lambda k, p: rs._one_pass(k, p, 0), keys, payload)
log(stage="done")
