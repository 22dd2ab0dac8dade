"""GS rank v2 ("net", pid-key selection network) vs the minloop rank.

The net rank (ops/gs_pallas.py::_rank_kernel_net) must produce
bit-identical rank tables to the K-round min-select implementation:
unique pids make the K-smallest-members selection unambiguous, and the
source codes/radii are recovered by matching the selected pids back
against the candidate streams.  The network generators are validated
exhaustively (0-1 principle) and by property tests; the kernels via
interpret mode on the same scenes the GS oracle tests use (small cap/K
on purpose — CPU XLA compile time is superlinear in the unrolled op
count, CLAUDE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_physics_engine_tpu import SimConfig
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.ops import gs_pallas as g


def _scene(n, seed, w=12.0, h=8.0, rmax=0.5):
    rng = np.random.default_rng(seed)
    pos = np.stack([rng.uniform(0.6, w - 0.6, n),
                    rng.uniform(0.6, h - 0.6, n)], -1).astype(np.float32)
    radii = rng.uniform(0.3, rmax, n).astype(np.float32)
    radii[0] = rmax
    return pos, radii


def _cfg(n, w=12.0, h=8.0, cap=4, K=4, rank="auto"):
    return SimConfig(max_particles=n, initial_particles=n,
                     world_width=w, world_height=h,
                     initial_radius=0.5, pipeline="tiled",
                     tile_multiplier=2.2, tile_cap=cap, max_occupancy=K,
                     sort_interval_steps=0, tiled_collide="jnp",
                     tiled_relocate="jnp", gs_rank=rank)


def test_oes_pairs_zero_one_principle():
    """A comparator network sorts all inputs iff it sorts every binary
    vector (Knuth 5.3.4): exhaustive for n = 2..16."""
    for n in (2, 4, 8, 16):
        pairs = g._oes_pairs(n)
        assert all(i < j for i, j in pairs)
        for v in range(2 ** n):
            a = [(v >> k) & 1 for k in range(n)]
            for i, j in pairs:
                if a[i] > a[j]:
                    a[i], a[j] = a[j], a[i]
            assert a == sorted(a), (n, v)


def test_topm_merge_selects_smallest():
    """Of two ascending m-lists the truncated bitonic merge returns the
    m smallest ascending — including duplicates and sentinel padding."""
    rng = np.random.default_rng(1)
    big = 2 ** 31 - 1
    for m in (4, 8):
        for trial in range(100):
            a = np.sort(rng.integers(0, 40, m)).astype(np.int64)
            b = np.sort(rng.integers(0, 40, m)).astype(np.int64)
            if trial % 3 == 0:  # sentinel-padded tails, like the kernel
                a[rng.integers(0, m):] = big
                b[rng.integers(0, m):] = big
            got = [int(v) for v in g._topm_merge(
                [jnp.int32(v) for v in a], [jnp.int32(v) for v in b])]
            want = sorted(list(a) + list(b))[:m]
            assert got == want, (m, a, b, got, want)


def _rank_tables(cfg, pos, radii):
    t = tiled.tile_geometry(cfg)[0]
    cap, K = cfg.tile_cap, cfg.max_occupancy
    st = tiled.init_tiles(cfg, pos, radii)
    one = jnp.float32(1.0).reshape((1,))

    @jax.jit
    def run(st, one):
        return g._rank_full(cfg, one, st.x, st.y, st.radius, st.pid,
                            cap, K, t)

    _, _, _, src, rpid, rrad, count = run(st, one)
    return (np.asarray(src), np.asarray(rpid), np.asarray(rrad),
            np.asarray(count))


@pytest.mark.parametrize("cap,K", [(4, 4), (3, 6)])
def test_rank_net_tables_bitmatch_minloop(cap, K):
    """Rank tables (src codes, pids, radii, counts) are bit-identical
    between the two implementations.  (3, 6) exercises the m=8 group
    size and sentinel-padded groups (27 streams -> 4 groups).  K=6 here
    is deliberate despite the CPU cap<=4/K<=4 discipline: this compiles
    the RANK kernels only (no K*36*cap solve/apply unroll), which stays
    in interpret-mode compile budget (~2 min for the whole module)."""
    pos, radii = _scene(120, 0)
    tabs_min = _rank_tables(_cfg(120, cap=cap, K=K, rank="minloop"),
                            pos, radii)
    tabs_net = _rank_tables(_cfg(120, cap=cap, K=K, rank="net"),
                            pos, radii)
    for a, b in zip(tabs_min, tabs_net):
        np.testing.assert_array_equal(a, b)
    # sanity: the scene actually produced multi-member cells
    assert int(tabs_min[3].max()) >= 2


def test_gs_flat_net_bitmatches_minloop():
    """Full flat GS pipeline: positions and overflow bit-match between
    gs_rank='net' and 'minloop'."""
    pos, radii = _scene(120, 4, w=11.3, h=7.7)
    outs = []
    for rank in ("minloop", "net"):
        cfg = _cfg(120, w=11.3, h=7.7, cap=4, K=4, rank=rank)
        st = tiled.init_tiles(cfg, pos, radii)
        outs.append(jax.jit(
            lambda s, c=cfg: g.gs_solve_pallas_flat(s, c))(st))
    np.testing.assert_array_equal(np.asarray(outs[0].x),
                                  np.asarray(outs[1].x))
    np.testing.assert_array_equal(np.asarray(outs[0].y),
                                  np.asarray(outs[1].y))
    assert int(outs[0].overflow_count) == int(outs[1].overflow_count)


def test_net_pid_domain_matches_minloop():
    """The net rank sorts raw pids (no code packing), so it shares
    minloop's full int31 pid domain: huge pids — e.g. from spawn
    counters that advanced past refused inserts, or checkpoint-restored
    ids far beyond max_particles — must rank identically."""
    pos, radii = _scene(120, 2)
    cfg_min = _cfg(120, cap=4, K=4, rank="minloop")
    st = tiled.init_tiles(cfg_min, pos, radii)
    # push every pid near the top of the int31 range (order preserved)
    import dataclasses
    huge = jnp.where(st.pid >= 0, st.pid + (2 ** 31 - 2 - 200), st.pid)
    st = dataclasses.replace(st, pid=huge)
    t = tiled.tile_geometry(cfg_min)[0]
    one = jnp.float32(1.0).reshape((1,))
    tabs = {}
    for rank in ("minloop", "net"):
        cfg = _cfg(120, cap=4, K=4, rank=rank)
        out = jax.jit(lambda s, o, c=cfg: g._rank_full(
            c, o, s.x, s.y, s.radius, s.pid, 4, 4, t))(st, one)
        tabs[rank] = [np.asarray(a) for a in out[3:]]
    for a, b in zip(tabs["minloop"], tabs["net"]):
        np.testing.assert_array_equal(a, b)
    assert int(tabs["minloop"][1].min()) >= 2 ** 31 - 2 - 200
