"""Engine facade over the persistent tiled pipeline (ops/tiled.py).

Mirrors core/engine.py::Engine's API (run/step/spawn/mouse/downloads) so
apps, the viewer and benchmarks can switch pipelines by constructing a
TiledEngine instead — the State-analog composition root for the sort-free
engine.  Downloads return arrays ordered by particle id, so trajectories
are comparable with the slot-ordered engines.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import StepParams
from gpu_physics_engine_tpu.ops import tiled
from gpu_physics_engine_tpu.utils.timer import FrameTimer


def _auto_cap(config: SimConfig, positions) -> int:
    """Pick tile_cap from the initial scene: 1.5x the densest tile,
    rounded up to a multiple of 4 (min 8)."""
    t, TY, TX = tiled.tile_geometry(config)
    ty = np.clip((positions[:, 1] // t).astype(np.int64) + 1, 1, TY - 2)
    tx = np.clip((positions[:, 0] // t).astype(np.int64) + 1, 1, TX - 2)
    occ = np.bincount(ty * TX + tx, minlength=TY * TX).max() if len(ty) else 0
    return max(8, int(-(-1.5 * occ // 4)) * 4)


class TiledEngine:
    def __init__(self, config: SimConfig, seed: int = 0,
                 initial_state: Optional[tiled.TileState] = None,
                 chunk: Optional[int] = None):
        if chunk is not None:
            # deeper scan chunks amortize the ~5.7 ms/program dispatch
            # floor further — worthwhile at small N where the device step
            # is itself sub-ms (bench.py picks per-size chunks)
            self.CHUNK = int(chunk)
        self.config = config
        self._key = jax.random.key(seed)
        if initial_state is None:
            k1, k2, self._key = jax.random.split(self._key, 3)
            n = config.initial_particles
            positions = np.stack([
                np.asarray(jax.random.uniform(
                    k1, (n,), jnp.float32, 0.0, config.world_width)),
                np.asarray(jax.random.uniform(
                    k2, (n,), jnp.float32, 0.0, config.world_height))], -1)
            radii = np.full(n, config.initial_radius, np.float32)
            if config.tile_cap == 0:
                self.config = config = config.replace(
                    tile_cap=_auto_cap(config, positions))
            initial_state = tiled.init_tiles(config, positions, radii)
        elif config.tile_cap == 0:
            self.config = config = config.replace(
                tile_cap=int(initial_state.dims[0]))
        self.state = initial_state
        if config.tiled_uniform_radius:
            # the uniform-radius sweep never reads the radius planes;
            # a state that violates the premise must fall back (e.g. a
            # checkpoint with mixed radii resumed under a uniform config)
            rad = np.asarray(self.state.radius)
            occm = np.asarray(self.state.pid) >= 0
            if occm.any() and not np.all(
                    rad[occm] == np.float32(config.initial_radius)):
                print("[tiled] mixed radii in initial state: disabling "
                      "tiled_uniform_radius")
                self.config = config = config.replace(
                    tiled_uniform_radius=False)
        self.big = None  # ops/bigs.py overlay, created on oversized spawn
        self._next_pid = int(self.state.num_active)
        self._steps_done = 0
        # storage-jam watchdog (config.tiled_watchdog, DESIGN.md §9)
        self.watchdog_events = 0
        self._wd_level = 0      # monotonic escalation within this engine
        self._wd_prev = None    # displaced pct at the previous boundary
        self._wd_retile_pct = None  # stale at the last +1-cap retile
        self._build_compiled()
        self.timer = FrameTimer().start()
        self.mouse_pos: Tuple[float, float] = (0.0, 0.0)
        self.mouse_pressed: bool = False

    def _build_compiled(self):
        """(Re)build every compiled function for self.config — called at
        construction and after a _retile geometry change."""
        config = self.config
        self._step = tiled.make_tiled_step(config)
        self._insert_ring = {}  # ring -> jitted insert_batch program
        # straggler sweep: the pull relocate moves one hop per step and can
        # transiently defer contended movers; the claim relocate handles
        # arbitrary jumps exactly, so run it at the Morton-resort cadence
        # (the reference's 4s grid-maintenance analog) as a safety net.
        # When the pull relocate is active the sweep is NOT optional:
        # multi-hop-stale movers (displaced >1 tile/step) interact with the
        # wrong neighborhood until relocated exactly, so a disabled
        # sort_interval_steps still gets a default cadence (240 steps = the
        # reference's 4 s at 60 fps, particle_system.rs:13-14).
        # the sweep needs a buffer sized to the displaced-storage
        # POPULATION (not the per-step crossing rate): under-provisioned,
        # dense scenes jam — deferred movers' slots block other movers,
        # the jam outgrows the buffer, and the prefix-biased compaction
        # never reaches high-index tiles (measured: deferred population
        # 1% -> 67% over 5760 steps at 4M, scripts/tpu_probe_4m_horizon.py).
        # The rotating tile_offset removes the prefix bias across sweeps.
        # the sweep is EXACT (no hysteresis filter): restoring the
        # in-band dancers too is what keeps hysteresis configs
        # long-horizon stable at a short cadence (the filtered variant
        # left dancers accumulating — measured in
        # scripts/tpu_probe_small_horizon.py; tiled.relocate keeps the
        # delta parameter for experiments)
        sweep_cap = config.sweep_mover_capacity or max(
            config.mover_capacity, config.max_particles // 16)
        # wholesale-rebuild implementation (config.tiled_rebuild_impl):
        # "gather" = smaller program graph, bit-identical placement —
        # built as the compile-feasibility attempt for 16M-slot-class
        # geometries, but its compile ALSO black-holed there (>95 min,
        # docs/probes_r5/tpu_probe_gs_rebuild_gather.jsonl — the
        # service failure is the geometry class, not payload count).
        # Do NOT re-queue it at the 4M-GS geometry without new
        # evidence; it remains a valid flavor wherever rebuild
        # compiles.
        _rebuild = (tiled.rebuild_gather
                    if config.tiled_rebuild_impl == "gather"
                    else tiled.rebuild)
        if config.tiled_sweep == "rebuild":
            # wholesale sort rebuild: the only sweep that resolves
            # displacement chains across full tiles (ops/tiled.rebuild)
            self._sweep = jax.jit(
                lambda s, off: _rebuild(s, config),
                donate_argnums=0)
        else:
            self._sweep = jax.jit(
                lambda s, off: tiled.relocate(s, config, m_cap=sweep_cap,
                                              tile_offset=off),
                donate_argnums=0)
        # hybrid sweep (tiled_rebuild_every=k): every k-th periodic
        # sweep runs the wholesale rebuild instead of the budgeted
        # relocate — chain residue bounded at the k-cadence
        # accumulation for 1/k of the rebuild tax (config.py rationale)
        self._sweep_rb = (jax.jit(
            lambda s, off: _rebuild(s, config), donate_argnums=0)
            if config.tiled_rebuild_every > 0
            and config.tiled_sweep != "rebuild" else None)
        # sectioned band rebuild (tiled_sweep="bands"): each periodic
        # sweep ALSO rebuilds tiled_band_k stale-targeted row bands —
        # ONE compiled program (row0 is traced) serves every position.
        # The compile-feasible chain resolver for geometries where the
        # monolithic rebuild does not compile (4M-GS: 81-min compile
        # ERROR, docs/probes_r4/tpu_probe_gs_rebuild.jsonl).
        if config.tiled_sweep == "bands":
            self._band_fn = jax.jit(
                lambda s, r0: tiled.rebuild_band(
                    s, config, r0, rows=config.tiled_band_rows),
                donate_argnums=0)
            # DRAINABLE mass only (max_dy): far-spilled stale no band
            # can contain at both ends must not capture the targeting
            self._stale_rows_fn = jax.jit(
                lambda s: tiled.stale_per_row(
                    s, config, max_dy=config.tiled_band_rows))
        else:
            self._band_fn = None
            self._stale_rows_fn = None
        self._band_rot = getattr(self, "_band_rot", 0)
        self.band_rebuilds = getattr(self, "band_rebuilds", 0)
        # counters survive recompiles (the watchdog's hysteresis-off
        # escalation calls _build_compiled mid-run; resetting would skew
        # the hybrid's rebuild phase and the rebuild_sweeps diagnostic)
        self._sweep_count = getattr(self, "_sweep_count", 0)
        self.rebuild_sweeps = getattr(self, "rebuild_sweeps", 0)
        pallas_reloc = config.tiled_relocate == "pallas" or (
            config.tiled_relocate == "auto"
            and jax.default_backend() == "tpu")
        self._sweep_interval = config.sort_interval_steps
        if pallas_reloc and not self._sweep_interval:
            self._sweep_interval = 240

        # multi-step chunk: K steps scanned inside ONE program.  Dispatch
        # over the tunneled runtime costs ~5.7 ms per program (measured,
        # even pipelined), comparable to the 4M device step itself; scanning
        # amortizes it to ~0.  params is a traced argument, so mouse/dt
        # changes don't recompile.
        # compiled per distinct scan length: run() windows that are not
        # CHUNK multiples (sweep cadence, sync_every, odd n_steps) get a
        # scanned program of the remainder length instead of degrading to
        # per-step dispatch (~5.7 ms/program over the tunnel — a 112-step
        # remainder at chunk 128 used to cost 112 dispatches)
        self._chunks = {}
        # relocate every iv-th step (SimConfig.tiled_relocate_interval):
        # the relocate phase is ~half the step cost (PERF.md phase split)
        # but only moves storage, never positions; the auto hysteresis
        # reserved (iv-1) steps of drift for the off-steps.  Each scanned
        # group starts with a relocating step, so the pattern restarts at
        # window boundaries (documented; windows are CHUNK-multiples of
        # iv in production).
        iv = max(1, config.tiled_relocate_interval)
        # parity-persistent GS (gs_layout="par"): the chunk converts
        # full-space <-> parity ONCE around the whole scanned window
        # (ops/gs_parity.py — the per-step relayout tax is what sank the
        # dec/mx layouts, PERF.md), instead of per step via step_fn
        # auto resolves to "par" on real TPU: hardware-verified bit-exact
        # (scripts/tpu_probe_gspar.py xcheck dx=dy=0.0) and 19% faster
        # (1M: 20.6 ms vs flat 25.5).  On CPU auto stays flat (the
        # parity chunk compiles ~20 interpret kernels — test-hostile).
        on_tpu = jax.default_backend() == "tpu"
        gs_par = (config.tiled_solver == "gs"
                  and (config.gs_layout == "par"
                       or (config.gs_layout == "auto" and on_tpu))
                  and (config.tiled_collide == "pallas"
                       or (config.tiled_collide == "auto" and on_tpu)))

        def _group(s, p, m):
            s = tiled.tiled_step_fn(s, p, config)
            for _ in range(m - 1):
                s = tiled.tiled_step_fn(s, p, config, do_relocate=False)
            return s

        def _chunk_of(k: int):
            if k not in self._chunks:
                if gs_par:
                    from gpu_physics_engine_tpu.ops.gs_parity import (
                        gs_parity_tile_step)
                    self._chunks[k] = jax.jit(
                        partial(gs_parity_tile_step, config=config,
                                n_steps=k), donate_argnums=0)
                    return self._chunks[k]

                def _chunk(state, p):
                    full, rem = divmod(k, iv)
                    if full:
                        state = jax.lax.scan(
                            lambda s, _: (_group(s, p, iv), None),
                            state, None, length=full)[0]
                    if rem:
                        state = _group(state, p, rem)
                    return state
                self._chunks[k] = jax.jit(_chunk, donate_argnums=0)
            return self._chunks[k]
        self._chunk_of = _chunk_of
        self._chunk = _chunk_of(self.CHUNK)
        # remainder-window scanning exists for the tunneled TPU runtime
        # (~5.7 ms per dispatched program); on CPU/interpret backends
        # per-step dispatch is free while every distinct window length
        # is a fresh (very slow) XLA compile — gate it off there
        self._scan_remainders = jax.default_backend() == "tpu"
        # single-step path: relocate when the steps-since-last-relocate
        # counter says the (iv-1)-step drift reserve is spent.  An
        # explicit counter, NOT _steps_done % iv: run() windows restart
        # the relocate-first group pattern at window boundaries, so an
        # absolute-phase step() after a window could stack up to
        # 2*(iv-1) consecutive off-steps — past the reserved bound.
        self._step_nr = jax.jit(
            partial(tiled.tiled_step_fn, config=config, do_relocate=False),
            donate_argnums=0) if iv > 1 else None
        self._reloc_iv = iv
        self._since_reloc = iv - 1  # force a relocate on the first step
        self._frame_chunks = {}
        self._step_render = {}  # fused interactive frame programs
        self._gs_par = gs_par
        self._stale_frac = jax.jit(
            lambda s: tiled.stale_pair_fraction(s, config))
        if self.big is not None:
            self._build_hybrid()

    def _watchdog(self):
        """Storage-jam self-defense (config.tiled_watchdog): detect a
        growing stale-pair population (>= 2-tile storage displacement —
        the collision-missing class; benign one-hop lag and hysteresis
        dancers never reach it) at run() boundaries and escalate
        mitigation — forced exact sweep, then hysteresis off, then +1
        slot capacity (repeatable).  DESIGN.md §9: the jam's signature
        is unbounded deferred-population growth; every mitigation level
        attacks a measured cause (sweep drains the backlog, hysteresis
        feeds it, capacity bounds the equilibrium).  Loud on purpose:
        each escalation prints and increments ``watchdog_events``."""
        cfg = self.config
        if not cfg.tiled_watchdog:
            return
        pct = float(self._stale_frac(self.state)) * 100.0
        prev, self._wd_prev = self._wd_prev, pct
        bound = cfg.tiled_watchdog_pct
        if pct <= bound:
            return  # healthy
        if prev is None:
            return  # first boundary: no slope yet
        # a slow LINEAR creep defeats a pure slope gate: +0.6%/boundary
        # grows 10-13% relatively once pct is large, always under the
        # 1.25x test — measured riding 5% -> 26% without one trip
        # (docs/probes_r5/tpu_probe_gs_bands.jsonl).  Past 4x the bound
        # the level is a jam regardless of slope.
        growing = pct > max(prev * 1.25, prev + 0.2)
        runaway = pct > 4.0 * bound
        if not growing and not runaway:
            return  # high but not growing (a settled plateau is the
                    # user's geometry choice, not a jam)
        self.watchdog_events += 1
        if growing:
            self._wd_level = min(self._wd_level + 1, 3)
        else:
            # plateau-runaway: drain loudly every boundary, but never
            # ratchet config (hysteresis/cap) without a growth signal —
            # a structural plateau would otherwise grow cap unboundedly
            self._wd_level = max(self._wd_level, 1)
        if self._wd_level >= 3 and self._wd_retile_pct is not None \
                and pct >= self._wd_retile_pct:
            # retile futility self-disarm: the last +1-cap retile did
            # not reduce the stale population — the jam is STRUCTURAL
            # (measured at 4M-GS: cap 6 -> 9 ratcheted in consecutive
            # boundaries, each a ~200 s full recompile, stale still
            # climbing — docs/probes_r5/tpu_probe_gs_bands2.jsonl).
            # Hold at forced-sweep containment instead of paying
            # unbounded recompiles for nothing.
            print("[tiled][watchdog] capacity growth did not reduce "
                  f"stale ({pct:.2f}% >= {self._wd_retile_pct:.2f}% at "
                  "the last retile): structural jam — holding at "
                  "forced-sweep containment")
            self._wd_level = 1
        act = {1: "forced exact sweep",
               2: "hysteresis off",
               3: f"tile_cap {cfg.tile_cap} -> {cfg.tile_cap + 1}"}[
                   self._wd_level]
        why = (f"growing (was {prev:.2f}%)" if growing
               else f"past the {4.0 * bound:.0f}% runaway ceiling "
                    f"(flat, was {prev:.2f}%)")
        print(f"[tiled][watchdog] stale-pair population {pct:.2f}% > "
              f"{bound}% and {why}: {act}")
        if self._wd_level >= 2 and cfg.hysteresis_delta > 0.0:
            self.config = self.config.replace(tiled_hysteresis=0.0)
            self._build_compiled()
        if self._wd_level >= 3:
            self._retile_cap(self.config.tile_cap + 1)
            self._wd_retile_pct = pct  # futility check at the next trip
            self._wd_level = 2  # cap growth is repeatable
        # every level drains the backlog with the strongest available
        # sweep (the rebuild when the hybrid is configured) so the next
        # boundary measures the mitigated config, not the backlog
        self.state = (self._sweep_rb or self._sweep)(
            self.state, self._sweep_off())
        if self._band_fn is not None:
            self.state = self._apply_bands(self.state)
        self._since_reloc = 0
        self._wd_prev = float(self._stale_frac(self.state)) * 100.0

    def _frame_chunk_of(self, k: int, width: int, height: int):
        """Scanned window of k frames where each frame = one sim step +
        the device compositor (render/device.py) — the reference's
        actual per-frame loop (state.rs:115-140 submits sim AND render
        every frame).  Frames reduce to a checksum inside the program:
        the tunnel cannot stream 60 x 2.7 MB/s anyway, and the metric is
        the chip's sim+render cost, not the download."""
        key = (k, width, height)
        if key in self._frame_chunks:
            return self._frame_chunks[key]
        config = self.config
        iv = self._reloc_iv
        from gpu_physics_engine_tpu.render.device import (_render_core,
                                                          autofit_rect)
        rect = jnp.asarray(autofit_rect(config, width, height),
                           jnp.float32)

        if self._gs_par:
            # parity-GS frame loop: convert full <-> parity ONCE around
            # the window (same amortization as the sim chunk) and render
            # each frame directly from parity space
            # (render/device.render_parity_core) — recomposing per frame
            # would reintroduce the mx relayout tax the layout avoids
            from gpu_physics_engine_tpu.ops.gs_parity import (
                from_parity, gs_parity_step_fn, to_parity)
            from gpu_physics_engine_tpu.render.device import (
                render_parity_core)
            _, TY, TX = tiled.tile_geometry(config)

            def _pchunk(carry, p):
                s, a = carry

                def body(c, _):
                    pc, a = c
                    pc = gs_parity_step_fn(pc, p, config)
                    img = render_parity_core(pc[0], rect, config,
                                             width, height, TY, TX)
                    return (pc, a + jnp.sum(img.astype(jnp.int32))), None

                (pc, a), _ = jax.lax.scan(body, (to_parity(s, config), a),
                                          None, length=k)
                return from_parity(pc, s, config), a

            self._frame_chunks[key] = jax.jit(_pchunk, donate_argnums=0)
            return self._frame_chunks[key]

        def _frame(s, p, a):
            img = _render_core(s.x, s.y, s.px, s.py, s.radius, s.pid,
                               rect, config, width, height)
            # full-image modular sum: a corner pixel is black in most
            # scenes and would make the checksum vacuous
            return a + jnp.sum(img.astype(jnp.int32))

        def _fgroup(carry, p, m):
            s, a = carry
            for j in range(m):
                s = tiled.tiled_step_fn(s, p, config, do_relocate=(j == 0))
                a = _frame(s, p, a)
            return s, a

        def _chunk(carry, p):
            full, rem = divmod(k, iv)
            if full:
                carry = jax.lax.scan(
                    lambda c, _: (_fgroup(c, p, iv), None),
                    carry, None, length=full)[0]
            if rem:
                carry = _fgroup(carry, p, rem)
            return carry

        self._frame_chunks[key] = jax.jit(_chunk, donate_argnums=0)
        return self._frame_chunks[key]

    def render_run(self, n_steps: int, width: int = 1280,
                   height: int = 720) -> int:
        """run() with the device render fused after EVERY step — the
        reference's published frame loop (sim + render per frame).
        Returns the window's frame checksum (fetching it is the honest
        device sync).  Covers the production tiled path AND the
        parity-GS chunk (render/device.render_parity_core renders from
        parity space, so the reference-exact solver can be measured
        under the reference's own frame metric); big-overlay scenes are
        not supported here (bench scenes have none)."""
        if self.big is not None:
            raise NotImplementedError(
                "render_run does not cover big-overlay scenes")
        p = self.params()
        interval = self._sweep_interval
        acc = jnp.int32(0)
        done = 0
        while done < n_steps:
            if (interval and self._steps_done
                    and self._steps_done % interval == 0):
                self.state = self._run_sweep()
                self._since_reloc = 0
            bound = n_steps - done
            if interval:
                bound = min(bound, interval - self._steps_done % interval
                            if self._steps_done % interval else interval)
            took = min(bound, self.CHUNK)
            self.state, acc = self._frame_chunk_of(
                took, width, height)((self.state, acc), p)
            self._since_reloc = ((took - 1) % self._reloc_iv
                                 if self._reloc_iv > 1 else 0)
            self._steps_done += took
            done += took
        return int(acc)

    def _build_hybrid(self):
        """Compiled step/chunk over (tiles, bigs) — built when the first
        oversized spawn creates the overlay (ops/bigs.py)."""
        from gpu_physics_engine_tpu.ops import bigs as bigs_ops
        config = self.config
        iv = self._reloc_iv

        self._hybrid_step = jax.jit(
            lambda ts, bg, p: bigs_ops.hybrid_step_fn(ts, bg, p, config),
            donate_argnums=(0, 1))
        # off-steps of tiled_relocate_interval (see _step_nr)
        self._hybrid_step_nr = jax.jit(
            lambda ts, bg, p: bigs_ops.hybrid_step_fn(
                ts, bg, p, config, do_relocate=False),
            donate_argnums=(0, 1)) if iv > 1 else None

        def _hgroup(c, p, m):
            c = bigs_ops.hybrid_step_fn(c[0], c[1], p, config)
            for _ in range(m - 1):
                c = bigs_ops.hybrid_step_fn(c[0], c[1], p, config,
                                            do_relocate=False)
            return c

        self._hybrid_chunks = {}

        def _hchunk_of(k: int):
            if k not in self._hybrid_chunks:
                def _hchunk(carry, p):
                    full, rem = divmod(k, iv)
                    if full:
                        carry = jax.lax.scan(
                            lambda c, _: (_hgroup(c, p, iv), None),
                            carry, None, length=full)[0]
                    if rem:
                        carry = _hgroup(carry, p, rem)
                    return carry
                self._hybrid_chunks[k] = jax.jit(_hchunk, donate_argnums=0)
            return self._hybrid_chunks[k]
        self._hybrid_chunk_of = _hchunk_of
        self._hybrid_chunk = _hchunk_of(self.CHUNK)

    def _retile(self, tile_max_radius: float):
        """Rebuild the tiling so particles up to ``tile_max_radius`` fit.

        The reference reacts to a spawn by growing cell_size to
        2.2 x max_radius and rebuilding grid buffers (grid.rs:265-291);
        the static-shape analog is a full re-tile: export every particle,
        rebuild TileState at the new geometry (edge 2.2 x new r_max, the
        reference cell sizing; cap auto-sized from the actual scene), and
        recompile the step.  One-time cost per radius growth (compile +
        rebin); physics is preserved exactly (positions/prev/pid carried).
        """
        pids, pos, prev, radii = tiled.export_particles(self.state)
        overflow = int(self.state.overflow_count)
        new_cfg = self.config.replace(
            tile_max_radius=float(tile_max_radius),
            tile_multiplier=2.2, tile_cap=0)
        new_cfg = new_cfg.replace(tile_cap=_auto_cap(new_cfg, pos))
        self.config = new_cfg
        self.state = tiled.init_tiles(new_cfg, pos, radii, pids=pids,
                                      previous_positions=prev)
        import dataclasses as _dc
        self.state = _dc.replace(
            self.state,
            overflow_count=self.state.overflow_count + overflow)
        self._build_compiled()

    def _retile_cap(self, new_cap: int):
        """Rebuild the tiling at the same geometry with a bigger slot
        capacity (deferral-driven growth, see tiled_auto_cap_pct)."""
        pids, pos, prev, radii = tiled.export_particles(self.state)
        overflow = int(self.state.overflow_count)
        self.config = self.config.replace(tile_cap=int(new_cap))
        self.state = tiled.init_tiles(self.config, pos, radii, pids=pids,
                                      previous_positions=prev)
        import dataclasses as _dc
        self.state = _dc.replace(
            self.state,
            overflow_count=self.state.overflow_count + overflow)
        self._build_compiled()

    def _maybe_grow_cap(self, steps: int, overflow_before: int):
        """Deferral-driven runtime adaptation (config.tiled_auto_cap_pct):
        if the deferred POPULATION over the finished run() window exceeds
        the threshold, re-tile with +1 slot capacity.  Checked only at
        run() boundaries — an in-run host fetch would break the scanned
        windows' dispatch pipelining (~5.7 ms/program tunnel floor)."""
        pct_bound = self.config.tiled_auto_cap_pct
        if not pct_bound or steps <= 0:
            return
        n = max(1, self.num_particles())
        delta = int(self.state.overflow_count) - overflow_before
        pct = delta / steps / n * 100.0 * max(
            1, self.config.tiled_relocate_interval)
        if pct > pct_bound:
            print(f"[tiled] deferred population {pct:.2f}%/step > "
                  f"{pct_bound}%: growing tile_cap "
                  f"{self.config.tile_cap} -> {self.config.tile_cap + 1}")
            self._retile_cap(self.config.tile_cap + 1)

    @classmethod
    def from_arrays(cls, config: SimConfig, positions, radii, **kw):
        if config.tile_cap == 0:
            config = config.replace(tile_cap=_auto_cap(
                config, np.asarray(positions, np.float32).reshape(-1, 2)))
        st = tiled.init_tiles(config, positions, radii, **kw)
        return cls(config, initial_state=st)

    def params(self, dt: Optional[float] = None) -> StepParams:
        return StepParams.make(
            self.config.dt if dt is None else dt,
            mouse=self.mouse_pos, pressed=self.mouse_pressed)

    def _sweep_off(self):
        """Rotating tile-scan start for the exact sweep (traced arg, so
        no recompile per sweep): a golden-ratio stride decorrelates the
        prefix the compaction favors when the buffer overflows."""
        self._sweep_count += 1
        return np.int32((self._sweep_count * 2654435761) & 0x7FFFFFFF)

    def _run_sweep(self):
        """One periodic sweep: the configured mechanism, with every
        k-th call upgraded to the wholesale rebuild when the hybrid is
        on (config.tiled_rebuild_every); "bands" mode appends the
        stale-targeted band rebuilds."""
        off = self._sweep_off()  # increments _sweep_count
        k = self.config.tiled_rebuild_every
        if self._sweep_rb is not None and k and self._sweep_count % k == 0:
            self.rebuild_sweeps += 1
            return self._sweep_rb(self.state, off)
        state = self._sweep(self.state, off)
        if self._band_fn is not None:
            state = self._apply_bands(state)
        return state

    def _apply_bands(self, state):
        """tiled_band_k band rebuilds at sweep cadence: greedy
        top-stale-mass windows from the stale_per_row histogram (a
        [TY]-int host fetch — one sync per sweep event), with a
        rotating filler band so a flat histogram still gets full-grid
        coverage over successive sweeps."""
        cfg = self.config
        _, TY, _ = tiled.tile_geometry(cfg)
        B = min(cfg.tiled_band_rows, TY)
        hist = np.asarray(self._stale_rows_fn(state))
        win = np.convolve(hist, np.ones(B, np.int64), mode="valid")
        starts = []
        w = win.copy()
        for _ in range(cfg.tiled_band_k):
            i = int(w.argmax())
            if w[i] <= 0:
                break
            starts.append(i)
            w[max(0, i - B + 1):i + B] = -1  # suppress overlaps
        # filler stride must be coprime with the modulus or the cycle
        # skips rows (gcd(B, TY-B+1) > 1 for some user band sizes —
        # round-5 review finding)
        M = max(TY - B + 1, 1)
        stride = B
        while math.gcd(stride, M) != 1:
            stride += 1
        while len(starts) < cfg.tiled_band_k:
            self._band_rot = (self._band_rot + stride) % M
            starts.append(self._band_rot)
        for r0 in starts:
            state = self._band_fn(state, np.int32(r0))
        self.band_rebuilds += len(starts)
        return state

    def _reloc_off(self) -> bool:
        """True when this step may skip the relocate (the counter of
        steps since the last relocating step hasn't spent the
        (interval-1)-step drift reserve)."""
        return (self._reloc_iv > 1
                and self._since_reloc < self._reloc_iv - 1)

    def step(self, params: Optional[StepParams] = None):
        interval = self._sweep_interval
        if interval and self._steps_done and self._steps_done % interval == 0:
            self.state = self._run_sweep()
            self._since_reloc = 0  # the exact sweep restores storage==home
        off_phase = self._reloc_off()
        if self.big is not None:
            hstep = self._hybrid_step_nr if off_phase else self._hybrid_step
            self.state, self.big = hstep(
                self.state, self.big, params or self.params())
        elif off_phase:
            self.state = self._step_nr(self.state, params or self.params())
        else:
            self.state = self._step(self.state, params or self.params())
        self._since_reloc = self._since_reloc + 1 if off_phase else 0
        self._steps_done += 1
        return self.state

    CHUNK = 16  # steps per scanned program in run()

    def run(self, n_steps: int, sync_every: int = 0):
        p = self.params()
        interval = self._sweep_interval
        done = 0
        # only fetch (= device sync) when the adaptation knob is on
        of_before = (int(self.state.overflow_count)
                     if self.config.tiled_auto_cap_pct else 0)
        while done < n_steps:
            if (interval and self._steps_done
                    and self._steps_done % interval == 0):
                self.state = self._run_sweep()
                self._since_reloc = 0
            # largest whole chunk that stays inside the sweep cadence and
            # the sync_every request
            bound = n_steps - done
            if interval:
                bound = min(bound, interval - self._steps_done % interval
                            if self._steps_done % interval else interval)
            if sync_every:
                bound = min(bound, sync_every - done % sync_every
                            if done % sync_every else sync_every)
            window = False  # took a relocate-first scanned window
            if self.big is not None:
                if bound >= self.CHUNK:
                    self.state, self.big = self._hybrid_chunk(
                        (self.state, self.big), p)
                    took = self.CHUNK
                    window = True
                elif bound > 1 and self._scan_remainders:
                    self.state, self.big = self._hybrid_chunk_of(bound)(
                        (self.state, self.big), p)
                    took = bound
                    window = True
                else:
                    off = self._reloc_off()
                    hstep = (self._hybrid_step_nr if off
                             else self._hybrid_step)
                    self.state, self.big = hstep(self.state, self.big, p)
                    took = 1
                    self._since_reloc = (self._since_reloc + 1 if off
                                         else 0)
            elif bound >= self.CHUNK:
                self.state = self._chunk(self.state, p)
                took = self.CHUNK
                window = True
            elif bound > 1 and self._scan_remainders:
                # remainder window: one scanned program of exactly
                # `bound` steps (compiled once per distinct length)
                self.state = self._chunk_of(bound)(self.state, p)
                took = bound
                window = True
            else:
                off = self._reloc_off()
                self.state = (self._step_nr if off else self._step)(
                    self.state, p)
                took = 1
                self._since_reloc = self._since_reloc + 1 if off else 0
            if window:
                # windows relocate first then group by iv: the tail of a
                # length-L window has (L-1) % iv un-relocated steps
                self._since_reloc = ((took - 1) % self._reloc_iv
                                     if self._reloc_iv > 1 else 0)
            self._steps_done += took
            done += took
            if sync_every and done % sync_every == 0:
                jax.block_until_ready(self.state.x)
            self.timer.get_delta(frames=took)
        self._maybe_grow_cap(n_steps, of_before)
        self._watchdog()
        return self.state

    # ---- interaction ----

    def press_mouse(self, world_pos):
        self.mouse_pos = tuple(map(float, world_pos))
        self.mouse_pressed = True

    def release_mouse(self):
        self.mouse_pressed = False

    def move_mouse(self, world_pos):
        self.mouse_pos = tuple(map(float, world_pos))

    def _insert_fns(self):
        """(ring1, place_at) jitted insert programs, built on first use:
        ring1 = home + the 8 neighbors (insert_batch, the common case);
        place_at = host-chosen far-spill targets (insert_at_tiles)."""
        fns = self._insert_ring.get("fns")
        if fns is None:
            config = self.config
            ring1 = jax.jit(
                lambda s, p, r, ids, placed: tiled.insert_batch(
                    s, config, p, r, ids, placed, tiled.INSERT_OFFSETS),
                donate_argnums=0)
            place_at = jax.jit(tiled.insert_at_tiles, donate_argnums=0)
            fns = (ring1, place_at)
            self._insert_ring["fns"] = fns
        return fns

    def _spawn_insert(self, pos, radii, ids):
        """The reference never refuses a spawn (arrays grow + grid
        rebuild, state.rs:187-200 / grid.rs:265-291), so a storage-full
        3x3 neighborhood spills to the nearest free tile — off-home
        storage is a deferred mover the relocate walks home.  The far
        spill runs on the HOST (spawns are rare and host-triggered);
        shared flow: ops/tiled.spawn_insert_into."""
        ring1, place_at = self._insert_fns()
        return tiled.spawn_insert_into(self, ring1, place_at,
                                       pos, radii, ids)

    def spawn_at(self, world_pos, count: Optional[int] = None,
                 verbose: bool = True):
        """Ring burst around a point (particle_system.rs:163-220 geometry)."""
        from gpu_physics_engine_tpu.ops.spawn import ring_burst

        count = count or self.config.spawn_burst
        # reference spawn radius is uniform {1, 2, 3} (particle_system.rs:189)
        # while the tiling is usually sized for the small initial radius.
        # tiled_spawn="retile" reproduces the reference's grid rebuild
        # (grid.rs:265-291 — fine at small N, uncompilable cap at 1M+);
        # the default routes oversized spawns to the big-particle overlay
        # (ops/bigs.py) and keeps the production tile geometry untouched.
        needed = float(min(self.config.spawn_radius_max, 3.0))
        if self.config.tile_max_radius is not None:
            # explicit geometry caps the spawn radii (documented knob)
            if self.config.tile_max_radius_effective < 1.0:
                raise ValueError(
                    "spawning needs SimConfig.tile_max_radius >= spawn "
                    f"radius (min 1.0); tiling was sized for "
                    f"{self.config.tile_max_radius_effective}")
            fits_tiles = True
        else:
            fits_tiles = self.config.tile_max_radius_effective >= needed
            if not fits_tiles and self.config.tiled_spawn == "retile":
                self._retile(needed)
                fits_tiles = True
        if not fits_tiles and self.config.tiled_solver == "gs":
            raise ValueError(
                "tiled_solver='gs' requires tile == reference cell "
                "geometry; size tile_max_radius for the spawn radii or "
                "use tiled_spawn='retile'")
        r_max = int(min(3.0, self.config.tile_max_radius_effective)) \
            if fits_tiles else int(needed)
        r_max = max(1, r_max)
        kring, self._key = jax.random.split(self._key)
        sx, sy, radii = ring_burst(kring, world_pos[0], world_pos[1],
                                   count, max_spawn_radius=r_max)
        sx = jnp.clip(sx, 0.0, self.config.world_width - 1e-3)
        sy = jnp.clip(sy, 0.0, self.config.world_height - 1e-3)
        ids = jnp.arange(count, dtype=jnp.int32) + self._next_pid
        self._next_pid += count
        pos = jnp.stack([sx, sy], -1)
        if self.config.tiled_uniform_radius and bool(np.any(
                np.asarray(radii)
                != np.float32(self.config.initial_radius))):
            # spawned radii break the uniform-radius premise: rebuild the
            # step with the general (radius-reading) sweep before insert
            print("[tiled] spawn with non-uniform radii: disabling "
                  "tiled_uniform_radius")
            self.config = self.config.replace(tiled_uniform_radius=False)
            self._build_compiled()
        if fits_tiles:
            self._spawn_insert(pos, radii, ids)
        else:
            small = np.asarray(radii) <= \
                self.config.tile_max_radius_effective
            if small.any():
                self._spawn_insert(
                    np.asarray(pos)[small],
                    np.asarray(radii)[small], np.asarray(ids)[small])
            if (~small).any():
                # only build the overlay (and the pricier hybrid step)
                # when an oversized particle actually arrived
                self._insert_bigs(np.asarray(pos)[~small],
                                  np.asarray(radii)[~small],
                                  np.asarray(ids)[~small])
        if verbose:
            print(f"Total particles: {self.num_particles()}")
        return self.state

    def _insert_bigs(self, pos: np.ndarray, radii: np.ndarray,
                     ids: np.ndarray, prev: np.ndarray = None):
        """Host-side insert into the overlay (spawns are rare and
        host-driven; no jit needed).  Capacity overruns count as refused
        inserts in overflow_count, like tile inserts.  ``prev`` resumes
        checkpointed previous positions (velocity) instead of a
        from-rest spawn."""
        from gpu_physics_engine_tpu.ops import bigs as bigs_ops
        import dataclasses as _dc
        if self.big is None:
            # size the overlay to the burst, not config.big_capacity:
            # couple_bigs' gather/scatter cost scales with the STATIC
            # capacity (mostly empty slots at 2048), so start small and
            # grow on demand (one recompile per doubling, spawns are
            # host-driven events anyway)
            cap0 = 128
            while cap0 < len(ids):
                cap0 *= 2
            self.big = bigs_ops.init_bigs(
                min(cap0, self.config.big_capacity))
            self._build_hybrid()
        if prev is None:
            prev = pos
        free = np.nonzero(np.asarray(self.big.pid) < 0)[0]
        if (len(free) < len(ids)
                and self.big.capacity < self.config.big_capacity):
            live = int(np.sum(np.asarray(self.big.pid) >= 0))
            newcap = self.big.capacity
            while newcap < live + len(ids):
                newcap *= 2
            newcap = min(newcap, self.config.big_capacity)
            pad = newcap - self.big.capacity
            self.big = _dc.replace(
                self.big,
                x=jnp.pad(self.big.x, (0, pad)),
                y=jnp.pad(self.big.y, (0, pad)),
                px=jnp.pad(self.big.px, (0, pad)),
                py=jnp.pad(self.big.py, (0, pad)),
                radius=jnp.pad(self.big.radius, (0, pad)),
                pid=jnp.pad(self.big.pid, (0, pad), constant_values=-1))
            self._build_hybrid()
            free = np.nonzero(np.asarray(self.big.pid) < 0)[0]
        n = min(len(free), len(ids))
        slots = jnp.asarray(free[:n], jnp.int32)
        self.big = _dc.replace(
            self.big,
            x=self.big.x.at[slots].set(pos[:n, 0]),
            y=self.big.y.at[slots].set(pos[:n, 1]),
            px=self.big.px.at[slots].set(prev[:n, 0]),
            py=self.big.py.at[slots].set(prev[:n, 1]),
            radius=self.big.radius.at[slots].set(radii[:n]),
            pid=self.big.pid.at[slots].set(ids[:n]),
            num_active=self.big.num_active + jnp.int32(n))
        if n < len(ids):
            self.state = _dc.replace(
                self.state, overflow_count=self.state.overflow_count
                + jnp.int32(len(ids) - n))

    # ---- downloads ----

    def num_particles(self) -> int:
        n = int(self.state.num_active)
        if self.big is not None:
            n += int(self.big.num_active)
        return n

    def _export(self):
        pid, pos, prev, rad = tiled.export_particles(self.state)
        if self.big is None or int(self.big.num_active) == 0:
            return pid, pos, prev, rad
        from gpu_physics_engine_tpu.ops import bigs as bigs_ops
        bpid, bpos, bprev, brad = bigs_ops.export_bigs(self.big)
        pid = np.concatenate([pid, bpid])
        order = np.argsort(pid, kind="stable")
        return (pid[order], np.concatenate([pos, bpos])[order],
                np.concatenate([prev, bprev])[order],
                np.concatenate([rad, brad])[order])

    def positions(self) -> np.ndarray:
        return self._export()[1]

    def previous_positions(self) -> np.ndarray:
        return self._export()[2]

    def radii(self) -> np.ndarray:
        return self._export()[3]

    def velocities(self) -> np.ndarray:
        _, pos, prev, _ = self._export()
        return pos - prev

    def cell_size(self) -> float:
        return tiled.tile_geometry(self.config)[0]

    # ---- checkpoint / resume (utils/checkpoint.py; the headless CLI's
    # --checkpoint/--resume flags use the same format).  Cross-topology:
    # the same file resumes on ShardedTiledEngine.from_checkpoint. ----

    def save_checkpoint(self, path: str) -> None:
        from gpu_physics_engine_tpu.utils.checkpoint import (
            save_tiled_checkpoint)
        save_tiled_checkpoint(path, self.state, self.config, big=self.big)

    @classmethod
    def from_checkpoint(cls, path: str, seed: int = 0, config=None,
                        **config_overrides) -> "TiledEngine":
        """``config`` replaces the stored one wholesale (e.g. the CLI's
        --set pipeline); ``config_overrides`` patch individual fields.
        Geometry changes are safe — the particles re-tile on load."""
        from gpu_physics_engine_tpu.utils.checkpoint import (
            load_tiled_bigs, load_tiled_checkpoint, peek_tiled_config)
        if config is None:
            config = peek_tiled_config(path)
        if config_overrides:
            config = config.replace(**config_overrides)
        state, _ = load_tiled_checkpoint(path, config=config)
        eng = cls(config, seed=seed, initial_state=state)
        bigs = load_tiled_bigs(path)
        if bigs is not None:
            bpid, bpos, bprev, brad = bigs
            eng._insert_bigs(np.asarray(bpos), np.asarray(brad),
                             np.asarray(bpid), prev=np.asarray(bprev))
            eng._next_pid = max(eng._next_pid, int(np.max(bpid)) + 1)
        return eng

    # ---- device-side rendering (render/device.py) ----

    def _step_render_of(self, width: int, height: int, off: bool):
        """One jitted program: sim step + device render -> (state, u8
        image).  The interactive loop's fused dispatch — over the
        tunneled runtime each dispatched program costs ~5 ms, so
        step+render as TWO programs pays that twice per displayed
        frame (measured: the preview-scale-4 frame floor is
        dispatch-bound, PERF.md round-4 interactive table)."""
        key = (width, height, off)
        if key in self._step_render:
            return self._step_render[key]
        config = self.config
        from gpu_physics_engine_tpu.render.device import _render_core
        if self._gs_par:
            from gpu_physics_engine_tpu.ops.gs_parity import (
                gs_parity_tile_step)

            def _fn(s, p, rect):
                s = gs_parity_tile_step(s, p, config, n_steps=1)
                img = _render_core(s.x, s.y, s.px, s.py, s.radius,
                                   s.pid, rect, config, width, height)
                return s, img
        else:
            def _fn(s, p, rect):
                s = tiled.tiled_step_fn(s, p, config,
                                        do_relocate=not off)
                img = _render_core(s.x, s.y, s.px, s.py, s.radius,
                                   s.pid, rect, config, width, height)
                return s, img
        self._step_render[key] = jax.jit(_fn, donate_argnums=0)
        return self._step_render[key]

    def step_render_frame(self, rect=None, width: int = 1280,
                          height: int = 720) -> np.ndarray:
        """step() + render_frame() fused into ONE dispatched program
        (big-overlay scenes fall back to the two-program path: bigs
        are host-splatted over the device frame)."""
        if self.big is not None:
            self.step()
            return self.render_frame(rect=rect, width=width,
                                     height=height)
        from gpu_physics_engine_tpu.render.device import autofit_rect
        interval = self._sweep_interval
        if (interval and self._steps_done
                and self._steps_done % interval == 0):
            self.state = self._run_sweep()
            self._since_reloc = 0
        if rect is None:
            rect = autofit_rect(self.config, width, height)
        off = self._reloc_off() and not self._gs_par
        self.state, img = self._step_render_of(width, height, off)(
            self.state, self.params(), jnp.asarray(rect, jnp.float32))
        self._since_reloc = self._since_reloc + 1 if off else 0
        self._steps_done += 1
        return np.asarray(img)

    def render_frame(self, rect=None, width: int = 1280,
                     height: int = 720) -> np.ndarray:
        """On-chip velocity-colormap frame -> host u8[H, W, 3].

        Downloads only the finished image (2.7 MB at 1280x720) instead of
        N x 4 particle arrays — the production display path at 1M+.
        Overlay bigs (ops/bigs.py) are exact-splatted on the host over
        the device frame: they are few (<= big_capacity) and large, so
        the tile-center quantization of the device path would distort
        them visibly."""
        from gpu_physics_engine_tpu.render.device import (
            autofit_rect, render_tiles_device)
        if rect is None:
            rect = autofit_rect(self.config, width, height)
        frame = render_tiles_device(self.state, self.config, rect=rect,
                                    width=width, height=height)
        if self.big is not None and int(self.big.num_active):
            from gpu_physics_engine_tpu.ops import bigs as bigs_ops
            from gpu_physics_engine_tpu.render import colormap, rasterizer
            _, bpos, bprev, brad = bigs_ops.export_bigs(self.big)
            x0, y0, x1, y1 = rect
            sx = (bpos[:, 0] - x0) * width / (x1 - x0)
            sy = (y1 - bpos[:, 1]) * height / (y1 - y0)  # world y-up
            sr = brad * width / (x1 - x0)
            rgb = colormap.velocity_colors(bpos - bprev)
            # order="C": device downloads can arrive non-C-contiguous
            # (seen on the TPU tunnel) and astype/div preserve ordering,
            # which the native splat rejects
            f32 = np.asarray(frame, dtype=np.float32, order="C") / 255.0
            rasterizer.splat(f32, sx, sy, sr, rgb)
            frame = (np.clip(f32, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        return frame
