"""Engine — the host-side composition root.

The analog of the reference's State (src/state.rs:33-205): owns the particle
state, the compiled step, the spawn path, and the latched mouse/input
parameters that feed each frame.  Unlike State it holds no GPU plumbing —
the whole frame is one jitted XLA program (core/stepper.py) and "input"
is just the StepParams pytree passed into it.

Typical use:

    eng = Engine(SimConfig(initial_particles=100_000))
    eng.run(600)                     # headless steps
    eng.press_mouse((100., 100.))    # attractor on (state.rs:164-169)
    eng.spawn_at((100., 100.))       # key `P` analog (state.rs:187-200)
    pos = eng.positions()            # host download (gpu_buffer.rs:96-175)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpu_physics_engine_tpu.core import state as state_lib
from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import ParticleState, StepParams
from gpu_physics_engine_tpu.core.stepper import make_step
from gpu_physics_engine_tpu.ops.spawn import add_particles
from gpu_physics_engine_tpu.utils.timer import FrameTimer


class Engine:
    def __init__(self, config: SimConfig, seed: int = 0,
                 initial_state: Optional[ParticleState] = None):
        self.config = config
        self._key = jax.random.key(seed)
        if initial_state is None:
            initial_state = state_lib.init_uniform(config, self._next_key())
        self.state = initial_state
        self._step = make_step(config)
        # K steps scanned inside one program: dispatch over the tunneled
        # runtime costs ~5.7 ms/program even pipelined (PERF.md); run()
        # uses this whenever no host interaction is due
        from gpu_physics_engine_tpu.core.stepper import step_fn

        def _chunk(state, p):
            return jax.lax.scan(
                lambda s, _: (step_fn(s, p, config), None),
                state, None, length=self.CHUNK)[0]
        self._chunk = jax.jit(_chunk, donate_argnums=0)
        self.timer = FrameTimer().start()
        # Latched input, consumed by every subsequent frame
        # (particle_integration.rs:176-185 latches the same way).
        self.mouse_pos: Tuple[float, float] = (0.0, 0.0)
        self.mouse_pressed: bool = False

    @classmethod
    def from_arrays(cls, config: SimConfig, positions, radii, **kw) -> "Engine":
        """Test-fixture constructor (ParticleSystem::new_from_buffers analog)."""
        st = state_lib.from_arrays(config, positions, radii, **kw)
        return cls(config, initial_state=st)

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def params(self, dt: Optional[float] = None) -> StepParams:
        return StepParams.make(
            self.config.dt if dt is None else dt,
            mouse=self.mouse_pos, pressed=self.mouse_pressed)

    # ---- frame loop ----

    def step(self, params: Optional[StepParams] = None) -> ParticleState:
        """Advance one frame (State::update analog, state.rs:115-134)."""
        self.state = self._step(self.state, params or self.params())
        return self.state

    CHUNK = 16  # steps per scanned program in run() (matches TiledEngine)

    def run(self, n_steps: int, sync_every: int = 0) -> ParticleState:
        """Advance n frames; optionally block_until_ready periodically."""
        p = self.params()
        done = 0
        while done < n_steps:
            bound = n_steps - done
            if sync_every:
                bound = min(bound, sync_every - done % sync_every
                            if done % sync_every else sync_every)
            if bound >= self.CHUNK:
                self.state = self._chunk(self.state, p)
                took = self.CHUNK
            else:
                self.state = self._step(self.state, p)
                took = 1
            done += took
            if sync_every and done % sync_every == 0:
                jax.block_until_ready(self.state.x)
            self.timer.get_delta(frames=took)
        jax.block_until_ready(self.state.x)
        return self.state

    # ---- interaction (InputManager/State callback analogs) ----

    def press_mouse(self, world_pos: Tuple[float, float]):
        self.mouse_pos = tuple(map(float, world_pos))
        self.mouse_pressed = True

    def release_mouse(self):
        self.mouse_pressed = False

    def move_mouse(self, world_pos: Tuple[float, float]):
        self.mouse_pos = tuple(map(float, world_pos))

    def spawn_at(self, world_pos: Tuple[float, float], count: Optional[int] = None,
                 verbose: bool = True):
        """Spawn a burst around a point (key `P` path, state.rs:187-200)."""
        self.state = add_particles(
            self.config, self.state, self._next_key(),
            float(world_pos[0]), float(world_pos[1]),
            count=count or self.config.spawn_burst)
        if verbose:  # reference prints the count on spawn (particle_system.rs:219)
            print(f"Total particles: {self.num_particles()}")
        return self.state

    # ---- host downloads (GpuBuffer::download analog, tests/inspection) ----

    def num_particles(self) -> int:
        return int(self.state.num_active)

    def positions(self) -> np.ndarray:
        n = self.num_particles()
        return np.stack(
            [np.asarray(self.state.x[:n]), np.asarray(self.state.y[:n])], axis=-1)

    def previous_positions(self) -> np.ndarray:
        n = self.num_particles()
        return np.stack(
            [np.asarray(self.state.px[:n]), np.asarray(self.state.py[:n])], axis=-1)

    def radii(self) -> np.ndarray:
        return np.asarray(self.state.radius[: self.num_particles()])

    def velocities(self) -> np.ndarray:
        return self.positions() - self.previous_positions()

    def cell_size(self) -> float:
        return float(self.config.cell_size(float(self.state.max_radius)))

    # ---- debug downloads (test/inspection parity with the reference's
    # Grid::cell_ids/object_ids accessors and
    # CollisionSystem::download_collision_cells, collision_system.rs:44) ----

    def debug_grid(self):
        """(sorted cell_ids u32[4N], object_ids i32[4N]) of the current
        state — the reference's post-sort grid buffers (grid.rs:310-312)."""
        from gpu_physics_engine_tpu.ops import grid as grid_ops
        cand = grid_ops.build_candidates(
            self.state.x, self.state.y, self.state.radius,
            self.state.active_mask(), self.cell_size())
        sc, so = grid_ops.sort_map(*grid_ops.build_cell_ids(cand))
        return np.asarray(sc), np.asarray(so)

    def debug_collision_cells(self):
        """(start indices u32[4N] UNUSED-padded, total) — the reference's
        collision_cells buffer + count."""
        from gpu_physics_engine_tpu.ops import collision as coll_ops
        sc, _ = self.debug_grid()
        cells, total = coll_ops.build_collision_cells(jnp.asarray(sc))
        return np.asarray(cells), int(total)
