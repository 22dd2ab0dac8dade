"""Simulation configuration.

The reference hardcodes every knob (see SURVEY.md §5 "Config / flag system"):
world 3048x1048 (reference src/state.rs:35), 1M initial particles
(particle_system.rs:28), sort interval 4 s (particle_system.rs:13), cell-size
multiplier 2.2 (grid.rs:20), stiffness 0.6 (collision_solver.wgsl:2), gravity
(0,0) and mouse strength 150 (particle_integration.wgsl:21-22), spawn bursts of
100 particles with radius 1-3 (particle_system.rs:163-220).  Here they are all
fields of a frozen dataclass so configs 1-5 of BASELINE.json are expressible.

Everything in SimConfig is *static* under jit: a new config triggers a
recompile, which is the XLA-native analog of the reference's pipeline-creation
-time WGSL override constants (compute_shader.rs:36-39).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Sentinel cell id marking unused candidate slots; sorts last as uint32.
# Same trick as the reference (grid.wgsl:5 UNUSED_CELL_ID = 0xffffffff).
UNUSED_CELL_ID = 0xFFFFFFFF


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static parameters of a simulation. Hashable → usable as a jit static arg."""

    # --- world (reference src/state.rs:35: Vec2(3048, 1048), 2D only) ---
    world_width: float = 3048.0
    world_height: float = 1048.0
    # "box": clamp to [r, world - r] (particle_integration.wgsl:68-71).
    # "circle": project onto the inscribed circle — the reference carries
    # this constraint commented out (particle_integration.wgsl:79-92).
    world_shape: str = "box"

    # --- capacity (XLA needs static shapes; reference grows GpuBuffers
    #     dynamically, gpu_buffer.rs:49-87 — here: capacity + num_active) ---
    max_particles: int = 1 << 20

    # --- physics (particle_integration.wgsl:21-22, collision_solver.wgsl:2) ---
    gravity: Tuple[float, float] = (0.0, 0.0)
    dt: float = 1.0 / 60.0
    stiffness: float = 0.6
    mouse_strength: float = 150.0
    substeps: int = 1

    # --- broad phase (reference src/grid/grid.rs:18-22) ---
    cell_size_multiplier: float = 2.2
    max_cells_per_object: int = 4  # home + up to 3 phantom cells in 2D
    # Max particles overlapping one cell that the dense solver will resolve.
    # The reference has no bound (its per-cell loops are data-dependent,
    # collision_solver.wgsl:66-118); XLA needs a static bound.  Overflows are
    # counted in state.overflow_count so dense packs degrade detectably.
    max_occupancy: int = 8

    # --- solver/pipeline selection ---
    # "colored": 4-color Gauss-Seidel over collision cells — reference
    #   semantics (collision_solver.rs:224-242, collision_solver.wgsl:55-58).
    # "fast": gather-free sort+shift Jacobi (ops/fast_solve.py) — the TPU
    #   speed-of-light path; same pairs/corrections, simultaneous apply.
    # "jacobi": gather-based per-particle accumulation over 3x3 neighbor
    #   buckets — kept as a cross-check; gathers are slow on TPU.
    solver: str = "colored"
    # "sorted": sort 4N (cell,obj) pairs like the reference (grid.rs:310).
    # "bucket": dense [num_cells, K] home-cell buckets built with scatter
    #   rounds; no global sort. TPU-native fast path.
    pipeline: str = "sorted"
    # key/value sort backend for the sorted pipeline + Morton resort:
    # "lax" = jax.lax.sort (production).  "radix" = Pallas blockwise radix
    # (ops/radix_sort.py) — RETIRED to cross-check status: correct and
    # stable but ~330 ms @1M, every stage XLA-random-access-bound
    # (DESIGN.md §9); kept for validating lax.sort, never for speed.
    sort_impl: str = "lax"
    # fast solver: pack per-entry corrections as 2x bf16 in the aggregation
    # sort (~35% faster aggregation, ~0.4% correction rounding). False for
    # exact f32 arithmetic.
    fast_pack_bf16: bool = True

    # --- Morton locality resort (particle_system.rs:13-14: every 4 s) ---
    sort_interval_steps: int = 240

    # --- initial scene (particle_system.rs:28,102-161) ---
    initial_particles: int = 1 << 20
    initial_radius: float = 0.5

    # --- interactive spawn (particle_system.rs:163-220: 100/burst, r in 1..=3) ---
    spawn_burst: int = 100
    spawn_radius_min: float = 1.0
    spawn_radius_max: float = 3.0

    # keep the per-particle static RGBA color field (reference C6 colors buffer;
    # vestigial there — the drawer colors by velocity — but part of the state API)
    track_colors: bool = False

    # --- persistent tiled pipeline (ops/tiled.py) ---
    # tile edge = tile_multiplier * tile_max_radius; must stay >= 2*max
    # live radius for 3x3 pair coverage (4.4 = two reference cells of slack)
    tile_multiplier: float = 4.4
    # particle slots per tile; 0 = auto-size from the initial scene's max
    # tile occupancy (resolved at TiledEngine construction)
    tile_cap: int = 24
    mover_capacity: int = 1 << 15  # per-step tile-crossing buffer
    # mover buffer for the PERIODIC exact sweep (the claim relocate run
    # every sort_interval_steps as the pull relocate's multi-hop safety
    # net).  0 = auto: max(mover_capacity, max_particles // 8).  The
    # sweep must be able to drain the displaced-storage population in
    # one pass: with only the per-step 32k buffer, dense scenes (4M)
    # accumulate a storage traffic jam the sweep can never clear —
    # measured deferred population growing 1% -> 67% over 5760 steps
    # (scripts/tpu_probe_4m_horizon.py) while the physics stayed calm.
    sweep_mover_capacity: int = 0
    # periodic-sweep mechanism: "relocate" = the budgeted claim sweep
    # above; "rebuild" = wholesale storage rebuild by one stable sort
    # (ops/tiled.rebuild) — the only sweep that resolves displacement
    # CHAINS across full tiles (relocate's free-slot claims cannot:
    # measured compounding stale residue at 4M GS density at any
    # cadence/cap, tpu_probe_gs4m_cadence.jsonl); "bands" = the claim
    # sweep PLUS tiled_band_k stale-targeted band rebuilds
    # (ops/tiled.rebuild_band) — the compile-feasible rebuild for
    # geometries where the monolithic sort program does not compile
    # (the 2.65M-cell 4M-GS grid: an 81-min compile ERROR,
    # docs/probes_r4/tpu_probe_gs_rebuild.jsonl).  The watchdog's
    # forced sweep uses whichever is configured.
    tiled_sweep: str = "relocate"
    # band-rebuild geometry for tiled_sweep="bands": rows per band
    # (static — ONE compiled program serves every band position via a
    # traced start row) and bands per sweep event (stale_per_row picks
    # where; a rotation term guarantees full-grid coverage)
    tiled_band_rows: int = 16
    tiled_band_k: int = 2
    # wholesale-rebuild implementation: "payload" = one 7-payload value
    # sort (ops/tiled.rebuild); "gather" = 2-payload (key, src) sort +
    # per-plane gathers (ops/tiled.rebuild_gather) — bit-identical
    # placement, much smaller program graph: the payload sort never
    # COMPILED at the 16M-slot 4M-GS geometry (81-min compile error)
    # while uncontained stale there rides to 91% over 21k steps
    # (docs/probes_r5/tpu_probe_gs4m_contain.jsonl)
    tiled_rebuild_impl: str = "payload"
    # HYBRID sweep: with tiled_sweep="relocate", run the wholesale
    # rebuild instead on every k-th periodic sweep (0 = never).  The
    # round-4 long-horizon probe (docs/probes_r4/
    # tpu_probe_prod_rebuild.jsonl) showed the two pure mechanisms each
    # losing somewhere: the relocate sweep leaves a compounding
    # displacement-chain residue (256k tuned row jammed at ~12k steps,
    # watchdog x7), while rebuild-every-sweep costs ~113 ms at the 512k
    # geometry (+44%/step at cadence 240).  Rebuilding every k-th sweep
    # bounds the chain residue at the k-cadence accumulation for ~1/k
    # of the rebuild tax.
    tiled_rebuild_every: int = 0
    # collide backend: "pallas" (ops/tiled_pallas.py band kernel), "jnp",
    # or "auto" (pallas on TPU, jnp elsewhere — interpret mode is test-only)
    tiled_collide: str = "auto"
    # relocate backend: "pallas" = bufferless pull kernels (handles any
    # mover rate, one hop/step), "jnp" = claim rounds over a mover_capacity
    # buffer (exact multi-tile jumps, defers on overflow), "auto" = pallas
    # on TPU
    tiled_relocate: str = "auto"
    # pull-relocate hysteresis: a particle relocates only once it sits at
    # least delta past its storage tile's boundary (delta in tile-edge
    # fractions; -1 = auto).  Boundary jitter ("dancers") otherwise
    # re-crosses every step and dominates both mover traffic and the
    # deferral metric.  Pair-set correctness is PROVABLE while
    # 2*delta_world + 2*r_max <= tile_edge (every true partner of a
    # delta-stale particle is still inside its 3x3 storage window); auto
    # picks min(0.25, 0.9*max_safe).  The exact claim relocate and the
    # periodic sweep still restore storage == home exactly.
    tiled_hysteresis: float = -1.0
    # relocate every k-th step (1 = every step).  The relocate phase is
    # ~half the tiled step cost at every production geometry (PERF.md
    # phase split) yet it only moves STORAGE, never positions: physics
    # stays exact while every particle remains within the pair-set
    # staleness bound of its storage tile (2*(delta + (k-1)*drift) +
    # 2*r_max <= tile_edge).  The auto hysteresis reserves
    # (k-1)*tiled_drift_budget of the margin for the un-relocated steps;
    # the periodic exact sweep (sort_interval_steps) still restores
    # storage == home.  Requires tiled_solver="sweep" (the GS parity
    # solver needs storage == home every step).
    tiled_relocate_interval: int = 1
    # per-step drift reserve (WORLD units) for the interval bound above;
    # -1 = auto (0.15 * r_max: steady-state |v| measures ~0.11 r/step at
    # every production scene, PERF.md).  Raise for hot scenes.
    tiled_drift_budget: float = -1.0
    # pull-relocate passes per step.  Matching is one-shot within a pass:
    # an arrival cannot take a slot vacated by a mover LEAVING the same
    # full tile this step (the plan sees pre-departure occupancy), which
    # is the dominant deferral mechanism at mid-size geometries once
    # matching contention is solved (greedy).  A second pass re-matches
    # against post-departure occupancy (and doubles multi-hop convergence).
    # Only the final pass's deferrals count toward overflow_count — a
    # mover placed by pass 2 was never truly deferred.
    tiled_relocate_passes: int = 1
    # tiled narrow phase: "sweep" = production 3x3 Jacobi pair sweep
    # (fused Pallas band kernel), "gs" = reference-parity 4-color
    # Gauss-Seidel on tiles-as-cells (ops/gs_tiled.py, ops/gs_pallas.py;
    # bit-matches the scalar model — pair with tile_multiplier=2.2 and
    # tiled_relocate="jnp")
    tiled_solver: str = "sweep"
    # GS Pallas kernel layout: "flat" = full-grid checkerboard-masked
    # kernels, "dec" = 2x2 color-decomposed sub-grids (each color pass
    # on a 4x smaller grid with no masking; XLA strided relayouts),
    # "mx" = the decomposed kernels with the relayouts done as blocked
    # one-hot MATMULS (MXU-speed, bit-exact via u16 half splits —
    # ops/gs_pallas.py), "par" = the decomposed kernels with the WHOLE
    # step kept in parity space (ops/gs_parity.py: rank + relocate +
    # integrate all run on the sub-grids; full-space state crosses the
    # mx relayout only at scan-chunk boundaries).  All bit-match the
    # scalar model (tests/test_gs_tiled.py, tests/test_gs_parity.py).
    # "auto" = "par" on real TPU (engine chunks; hardware-verified
    # bit-exact, 1M GS step 11.5 ms vs flat 25.5 with the fused-parity
    # kernels — scripts/tpu_probe_gspar.py, tpu_probe_gspar2.py), flat
    # elsewhere.  "dec"/"mx" are kept
    # as structural cross-checks: the dec kernels are ~4x cheaper but
    # their per-step relayout tax erases the win (XLA strided ~130 ms
    # @1M; mx matmuls 10.2 ms for x/y/pid alone — flat 23.7 vs mx
    # 28.4 ms, PERF.md); "par" pays it only at scan-chunk boundaries.
    gs_layout: str = "auto"
    # gs_layout="mx" relayout precision: True (safe default) splits every
    # 32-bit plane into exact u16-half f32 planes before the one-hot
    # matmuls — bit-faithful on any hardware; False rides raw f32 planes
    # through Precision.HIGHEST matmuls (half the relayout work) — flip
    # only after scripts/tpu_probe_gsmx.py's raw_f32_onehot_exact check
    # confirms exactness on the target chip.  Int planes always split.
    gs_mx_split: bool = True
    # GS rank kernel implementation (ops/gs_pallas.py):
    #   "minloop" — K rounds of min-select over all 9*cap candidate
    #               streams with taken-bookkeeping (~K*9*cap*6 VPU ops).
    #   "net"     — select the K smallest member pids via Batcher group
    #               sorters + truncated bitonic merges (pure i32 min/max
    #               compare-exchanges; ~33% fewer rank ops), then recover
    #               source codes/radii by one pid-match pass.
    #               Bit-identical outputs to "minloop" (unique pids).
    #   "auto"    — "net": hardware-verified faster (v5e @1M: rank-only
    #               6.89 vs 7.79 ms, end-to-end 23.83 vs 25.01;
    #               scripts/tpu_probe_gsrank.py).
    gs_rank: str = "auto"
    # gs_layout="par": fuse each phase's four per-parity kernels (rank /
    # relocate plan / relocate apply) into one kernel pass — identical
    # math, 4x less input HBM traffic (every sub-grid is re-read by all
    # four parity kernels otherwise).  Hardware-verified
    # (scripts/tpu_probe_gspar2.py): bit-exact (dx=dy=0.0 at 64k) and
    # 1M GS step 11.53 ms vs 20.63 unfused / 25.5 flat.  None = auto:
    # fused on real TPU, unfused elsewhere (the fused kernels' 4x-bigger
    # programs hit CPU interpret's superlinear compile).
    gs_par_fused: Optional[bool] = None
    # gs_layout="par": fuse each substep's Verlet integration into the
    # color-4 apply (ops/gs_parity._apply_integrate_dec_kernel) —
    # deletes the separate integrate pass (~1.0 ms @1M, phase profile
    # in scripts/tpu_probe_gs_phase2.py) for the price of px/py mid
    # reads+writes in that apply.  Requires tiled_uniform_radius and a
    # box world (auto-falls-back otherwise).  None = follow
    # gs_par_fused's resolution (fused on real TPU only).
    gs_fuse_integrate: Optional[bool] = None
    # gs_layout="par": run all four ordered color passes in ONE
    # DMA-windowed kernel (ops/gs_mega.py) instead of 4 solve + 4
    # apply passes — the color passes are ~80% HBM-traffic-bound and
    # the mega kernel reads each sub-grid once per block with an
    # 8-sub-row halo.  Uniform-radius + TPU only; bit-exact vs the
    # sequential loop (hardware xcheck, scripts/tpu_probe_gs_mega.py).
    # MEASURED NEGATIVE (same-process A/B, tpu_probe_gs_mega3): 1M
    # cap4 8.46 vs seq 8.22 ms, 2M cap5 10.46 vs 10.24, 4M cap6 13.44
    # vs 13.26 — the per-color kernels already overlap their DMA tails
    # across colors, while the mega window pays HALO-row recompute per
    # block and a streaming loop order forced by the register-spill
    # ceiling.  Kept as a verified-exact documented negative; default
    # stays off.
    gs_colors_mega: bool = False
    # gs_layout="par": fuse the relocate plan + apply into one
    # DMA-windowed kernel (ops/gs_mega.relocate_mega) — deletes the
    # plan HBM round trip and the apply's 3x band re-reads.  Matching
    # cores shared with the sequential path (bit-identical storage).
    # Uniform-radius + TPU only.  MEASURED NEGATIVE
    # (tpu_probe_gs_mega run 2: 1M cap4 colors-mega 8.33 -> 9.95 ms
    # with this on): the fused window recomputes every halo row's plan
    # per block and its per-plane streaming (register-spill ceiling)
    # serializes what the separate plan/apply kernels pipeline.  Kept
    # as a verified-exact documented negative; default stays off.
    gs_relocate_mega: bool = False
    # device-render sampling: S x S sample points per tile
    # (render/device.py).  1 = one sample per tile — the production
    # choice at 4M where tiles ~ output pixels; raise to 2-4 to recover
    # sub-tile particle positioning when zoomed in (composite cost grows
    # with S^2).  Splat radius is clamped to cover the sample cell, so
    # no particle is ever dropped at any S (point-sprite minimum).
    render_supersample: int = 1
    # fuse Verlet integration into the Pallas collide kernel (one band
    # read/write per substep instead of a separate XLA integrate pass)
    tiled_fuse_integrate: bool = True
    # Newton's-third-law sweep (ops/tiled_pallas.py::_pair_sweep_newton):
    # evaluate each cross-tile pair ONCE (self tile + 4 forward offsets
    # instead of all 9) and scatter the reaction half back by rolling the
    # per-slot reaction planes to the partner tile; band-seam reactions
    # ride a VMEM scratch carry between the sequential grid steps.
    # 5*cap^2 candidate evaluations per tile instead of 9*cap^2 on a
    # sweep that is VPU-bound (PERF.md roofline), and the 'up' neighbor
    # blocks are never read.  Same pair set and per-pair math; the
    # accumulation ORDER differs, so positions match the standard sweep
    # to f32 rounding (~1e-6 world units), not bitwise.  Off until
    # hardware-verified (scripts/tpu_probe_newton.py).
    tiled_newton: bool = False
    # every particle has radius == initial_radius (the BASELINE scenes'
    # case: constant 0.5, particle_system.rs:117).  The Pallas sweep then
    # folds rsum = 2*r0 and the inverse-mass split 1/2 into compile-time
    # constants and never reads the radius planes (3 fewer input blocks,
    # ~30% fewer sweep ops — ops/tiled_pallas.py::_pair_sweep).  NOT
    # bit-identical to the general path (ulp-level; pair set identical).
    # TiledEngine validates this at init and auto-falls-back to the
    # general kernel when a spawn inserts a different radius into tiles.
    tiled_uniform_radius: bool = False
    # storage-jam watchdog (DESIGN.md §9): at every run() boundary the
    # engine fetches the stale-pair population (>= 2-tile storage
    # displacement, ops/tiled.stale_pair_fraction — the class that can
    # MISS collisions; the >= 1 displaced class includes benign one-hop
    # relocate lag and hysteresis dancers and legitimately reaches tens
    # of %% on fast small-tile scenes).  On sustained growth past
    # tiled_watchdog_pct it escalates mitigation — forced exact sweep ->
    # hysteresis off -> +1 slot capacity — and counts a warning
    # (TiledEngine.watchdog_events).  An off-table world/density now
    # degrades LOUDLY and self-stabilizes instead of silently
    # avalanching (the reference contrast: it silently drops pairs past
    # K=6, grid.wgsl membership).  Costs one jitted reduction + scalar
    # fetch per run() call.  Healthy production scenes measure
    # <= 0.4%% stale (BENCH curve); the default bound leaves 5x margin.
    tiled_watchdog: bool = True
    tiled_watchdog_pct: float = 2.0
    # pull-relocate slot matching:
    #   "flip"   — free slot k pulls the neighbor's slot cap-1-k mover:
    #              one chance/mover/step, cheapest.
    #   "flip2"  — flip chance + direct-slot chance with claimed
    #              bookkeeping: ~2x flip's plan selects, several-fold
    #              lower contention deferral.
    #   "greedy" — exact sequential matching of every free slot against
    #              every unclaimed mover (8*cap^2 ops/tile): near-zero
    #              matching deferral; measured the best 4M config
    #              (mult 3.3 / cap 6: 8.3 ms, 0.001%/step).
    #   "auto"   — greedy on grids <= 800k tiles with cap <= 8 (extra
    #              ops are noise there), flip2 otherwise.
    tiled_match: str = "auto"
    # largest radius the tiling must accommodate; None -> initial_radius
    # (set to spawn_radius_max when interactive spawning is used)
    tile_max_radius: float | None = None
    # runtime geometry adaptation: when > 0, TiledEngine.run() checks the
    # deferred POPULATION (overflow delta/step/particle x relocate
    # interval — the physics-quality signal, PERF.md) over each finished
    # run() window and re-tiles with +1 slot capacity when it exceeds
    # this percentage.  Checked only at run() boundaries (an in-run fetch
    # would break dispatch pipelining); one recompile per growth.  0 =
    # off (the default: production geometries are pre-swept, core/tuned.py)
    tiled_auto_cap_pct: float = 0.0
    # spawn handling when a spawned radius exceeds the tile geometry:
    # "bigs" = big-particle overlay (ops/bigs.py: tile grid unchanged,
    # oversized particles in a dense side array coupled via gather
    # windows — the production answer; re-tiling a 1M+ scene for
    # radius-3 spawns inflates the auto cap past 40, uncompilable),
    # "retile" = reference-faithful full re-tile (grid.rs:265-291
    # analog; fine at small N), "auto" = bigs.
    tiled_spawn: str = "auto"
    # overlay capacity (static shape; ~20 reference spawn bursts)
    big_capacity: int = 2048

    # --- multi-chip (net-new; BASELINE.json config 5) ---
    mesh_axis: str = "shards"
    halo_capacity: int = 1024       # per-neighbor halo slots
    migration_capacity: int = 256   # per-neighbor per-step migration slots

    def __post_init__(self):
        assert self.max_particles >= self.initial_particles
        assert self.solver in ("colored", "fast", "jacobi")
        assert self.pipeline in ("sorted", "bucket", "tiled")
        assert self.sort_impl in ("lax", "radix")
        assert self.tiled_match in ("flip", "flip2", "greedy", "auto")
        assert self.tiled_relocate_passes >= 1
        assert self.tiled_spawn in ("bigs", "retile", "auto")
        assert self.big_capacity >= 1
        assert self.tiled_solver in ("sweep", "gs")
        assert self.tiled_sweep in ("relocate", "rebuild", "bands")
        assert self.tiled_band_rows >= 2 and self.tiled_band_k >= 1
        assert self.tiled_rebuild_impl in ("payload", "gather")
        assert self.tiled_relocate_interval >= 1
        assert not (self.tiled_solver == "gs"
                    and self.tiled_relocate_interval > 1), (
            "the GS parity solver requires storage == home every step")
        assert self.gs_layout in ("auto", "dec", "flat", "mx", "par")
        assert self.gs_rank in ("auto", "minloop", "net")
        assert 1 <= self.render_supersample <= 4
        assert self.world_shape in ("box", "circle")
        assert self.max_cells_per_object == 4, "2D: home + 3 phantom cells"

    # ---- derived (static) quantities ----

    @property
    def capacity(self) -> int:
        """Particle slots, padded to a TPU-friendly multiple of 1024 lanes."""
        return _round_up(self.max_particles, 1024)

    @property
    def tile_max_radius_effective(self) -> float:
        return (self.tile_max_radius if self.tile_max_radius is not None
                else self.initial_radius)

    @property
    def min_cell_size(self) -> float:
        """Smallest cell size that can ever occur.

        cell_size = multiplier * max_radius (grid.rs:159-161) and max_radius
        only grows over a run (spawned particles are larger, particle_system.rs:189),
        so the initial radius bounds the cell count from above.
        """
        return self.cell_size_multiplier * self.initial_radius

    @property
    def grid_dims(self) -> Tuple[int, int]:
        """Static upper bound on grid cells per axis (for the bucket pipeline)."""
        nx = int(math.ceil(self.world_width / self.min_cell_size)) + 2
        ny = int(math.ceil(self.world_height / self.min_cell_size)) + 2
        return nx, ny

    @property
    def num_cells(self) -> int:
        nx, ny = self.grid_dims
        return nx * ny

    def cell_size(self, max_radius: float) -> float:
        """Dynamic cell size given the current largest radius (grid.rs:159-161)."""
        return self.cell_size_multiplier * max_radius

    @property
    def drift_budget(self) -> float:
        """Per-step staleness drift reserve in WORLD units (see
        tiled_drift_budget)."""
        if self.tiled_drift_budget >= 0.0:
            return self.tiled_drift_budget
        return 0.15 * self.tile_max_radius_effective

    @property
    def hysteresis_delta(self) -> float:
        """Resolved pull-relocate hysteresis in WORLD units (see
        tiled_hysteresis).  0 when the geometry leaves no safe margin.
        With tiled_relocate_interval=k, (k-1) steps of drift_budget are
        reserved out of the safe margin so the pair-set bound
        2*(delta + (k-1)*drift) + 2*r_max <= tile_edge keeps holding."""
        t = self.tile_multiplier * self.tile_max_radius_effective
        d_max = (t - 2.0 * self.tile_max_radius_effective) / 2.0
        d_max -= (self.tiled_relocate_interval - 1) * self.drift_budget
        d_max = max(0.0, d_max)
        if self.tiled_hysteresis >= 0.0:
            d = self.tiled_hysteresis * t
        else:
            d = min(0.25 * t, 0.9 * d_max)
        return max(0.0, min(d, 0.95 * d_max))

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
