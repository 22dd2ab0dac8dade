"""Engine facade over the persistent tiled pipeline (ops/tiled.py).

Mirrors core/engine.py::Engine's API (run/step/spawn/mouse/downloads) so
apps, the viewer and benchmarks can switch pipelines by constructing a
TiledEngine instead — the State-analog composition root for the sort-free
engine.  Downloads return arrays ordered by particle id, so trajectories
are comparable with the slot-ordered engines.
"""

from __future__ import annotations

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
        self._next_pid = int(self.state.num_active)
        self._steps_done = 0
        self._build_compiled()
        self.timer = FrameTimer().start()
        self.mouse_pos: Tuple[float, float] = (0.0, 0.0)
        self.mouse_pressed: bool = False

    def _build_compiled(self):
        """(Re)build every compiled function for self.config — called at
        construction and after a _retile geometry change."""
        config = self.config
        self._step = tiled.make_tiled_step(config)
        self._insert = jax.jit(
            lambda s, p, r, ids: tiled.insert_particles(s, config, p, r, ids),
            donate_argnums=0)
        # straggler sweep: the pull relocate moves one hop per step and can
        # transiently defer contended movers; the claim relocate handles
        # arbitrary jumps exactly, so run it at the Morton-resort cadence
        # (the reference's 4s grid-maintenance analog) as a safety net.
        # When the pull relocate is active the sweep is NOT optional:
        # multi-hop-stale movers (displaced >1 tile/step) interact with the
        # wrong neighborhood until relocated exactly, so a disabled
        # sort_interval_steps still gets a default cadence (240 steps = the
        # reference's 4 s at 60 fps, particle_system.rs:13-14).
        self._sweep = jax.jit(
            lambda s: tiled.relocate(s, config), donate_argnums=0)
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
        def _chunk(state, p):
            return jax.lax.scan(
                lambda s, _: (tiled.tiled_step_fn(s, p, config), None),
                state, None, length=self.CHUNK)[0]
        self._chunk = jax.jit(_chunk, donate_argnums=0)

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

    def step(self, params: Optional[StepParams] = None):
        interval = self._sweep_interval
        if interval and self._steps_done and self._steps_done % interval == 0:
            self.state = self._sweep(self.state)
        self.state = self._step(self.state, params or self.params())
        self._steps_done += 1
        return self.state

    CHUNK = 16  # steps per scanned program in run()

    def run(self, n_steps: int, sync_every: int = 0):
        p = self.params()
        interval = self._sweep_interval
        done = 0
        while done < n_steps:
            if (interval and self._steps_done
                    and self._steps_done % interval == 0):
                self.state = self._sweep(self.state)
            # largest whole chunk that stays inside the sweep cadence and
            # the sync_every request
            bound = n_steps - done
            if interval:
                bound = min(bound, interval - self._steps_done % interval
                            if self._steps_done % interval else interval)
            if sync_every:
                bound = min(bound, sync_every - done % sync_every
                            if done % sync_every else sync_every)
            if bound >= self.CHUNK:
                self.state = self._chunk(self.state, p)
                took = self.CHUNK
            else:
                self.state = self._step(self.state, p)
                took = 1
            self._steps_done += took
            done += took
            if sync_every and done % sync_every == 0:
                jax.block_until_ready(self.state.x)
            self.timer.get_delta(frames=took)
        return self.state

    # ---- interaction ----

    def press_mouse(self, world_pos):
        self.mouse_pos = tuple(map(float, world_pos))
        self.mouse_pressed = True

    def release_mouse(self):
        self.mouse_pressed = False

    def move_mouse(self, world_pos):
        self.mouse_pos = tuple(map(float, world_pos))

    def spawn_at(self, world_pos, count: Optional[int] = None,
                 verbose: bool = True):
        """Ring burst around a point (particle_system.rs:163-220 geometry)."""
        from gpu_physics_engine_tpu.ops.spawn import ring_burst

        count = count or self.config.spawn_burst
        # reference spawn radius is uniform {1, 2, 3} (particle_system.rs:189);
        # the static tiling must accommodate it.  When the user set
        # tile_max_radius explicitly it caps the spawn radii (documented
        # knob); otherwise re-tile at the full spawn radius — the analog
        # of the reference growing cell_size and rebuilding its grid on
        # spawn (grid.rs:265-291).  One-time recompile per radius growth.
        if self.config.tile_max_radius is None:
            needed = float(min(self.config.spawn_radius_max, 3.0))
            if self.config.tile_max_radius_effective < needed:
                self._retile(needed)
        elif self.config.tile_max_radius_effective < 1.0:
            raise ValueError(
                "spawning needs SimConfig.tile_max_radius >= spawn radius "
                f"(max 3.0); tiling was sized for "
                f"{self.config.tile_max_radius_effective}")
        r_max = int(min(3.0, self.config.tile_max_radius_effective))
        kring, self._key = jax.random.split(self._key)
        sx, sy, radii = ring_burst(kring, world_pos[0], world_pos[1],
                                   count, max_spawn_radius=r_max)
        sx = jnp.clip(sx, 0.0, self.config.world_width - 1e-3)
        sy = jnp.clip(sy, 0.0, self.config.world_height - 1e-3)
        ids = jnp.arange(count, dtype=jnp.int32) + self._next_pid
        self._next_pid += count
        self.state = self._insert(
            self.state, jnp.stack([sx, sy], -1), radii, ids)
        if verbose:
            print(f"Total particles: {self.num_particles()}")
        return self.state

    # ---- downloads ----

    def num_particles(self) -> int:
        return int(self.state.num_active)

    def _export(self):
        return tiled.export_particles(self.state)

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

    # ---- device-side rendering (render/device.py) ----

    def render_frame(self, rect=None, width: int = 1280,
                     height: int = 720) -> np.ndarray:
        """On-chip velocity-colormap frame -> host u8[H, W, 3].

        Downloads only the finished image (2.7 MB at 1280x720) instead of
        N x 4 particle arrays — the production display path at 1M+."""
        from gpu_physics_engine_tpu.render.device import render_tiles_device
        return render_tiles_device(self.state, self.config, rect=rect,
                                   width=width, height=height)
