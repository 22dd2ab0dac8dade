"""Checkpoint / resume.

The reference has none (SURVEY.md §5: state lives solely in GPU buffers);
for benchmark-parity configs and long runs it is worth having, and the SoA
state is just a handful of arrays.  Format: one .npz with the particle
arrays + counters, plus the SimConfig as JSON so a checkpoint is
self-describing.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gpu_physics_engine_tpu.core.config import SimConfig
from gpu_physics_engine_tpu.core.state import ParticleState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: ParticleState, config: SimConfig) -> None:
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    np.savez_compressed(
        path,
        __version__=np.int32(_FORMAT_VERSION),
        __config__=np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), dtype=np.uint8),
        **arrays)


def load_checkpoint(path: str) -> Tuple[ParticleState, SimConfig]:
    with np.load(path) as z:
        version = int(z["__version__"])
        assert version == _FORMAT_VERSION, f"unknown checkpoint version {version}"
        cfg_dict = json.loads(bytes(z["__config__"].tobytes()).decode())
        cfg_dict["gravity"] = tuple(cfg_dict["gravity"])
        config = SimConfig(**cfg_dict)
        fields = {f.name: jnp.asarray(z[f.name])
                  for f in dataclasses.fields(ParticleState)}
    return ParticleState(**fields), config


# ---- tiled pipeline (ops/tiled.py): checkpoints store the particle
# arrays (pid-ordered), not the tile layout — re-tiled on load ----

def save_tiled_checkpoint(path: str, state, config: SimConfig,
                          big=None) -> None:
    """``big`` = the engine's big-particle overlay (ops/bigs.py), saved
    as separate arrays — oversized particles do not live in the tiles
    and would otherwise be silently dropped."""
    from gpu_physics_engine_tpu.ops.tiled import export_particles

    pid, pos, prev, rad = export_particles(state)
    extra = {}
    if big is not None:
        from gpu_physics_engine_tpu.ops.bigs import export_bigs
        bpid, bpos, bprev, brad = export_bigs(big)
        if len(bpid):
            extra = dict(big_pid=bpid, big_positions=bpos,
                         big_previous=bprev, big_radii=brad)
    np.savez_compressed(
        path,
        __version__=np.int32(_FORMAT_VERSION),
        __kind__=np.frombuffer(b"tiled", dtype=np.uint8),
        __config__=np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), dtype=np.uint8),
        pid=pid, positions=pos, previous_positions=prev, radii=rad,
        overflow=np.asarray(state.overflow_count), **extra)


def peek_tiled_config(path: str) -> SimConfig:
    """The stored SimConfig without building any state."""
    with np.load(path) as z:
        assert bytes(z["__kind__"].tobytes()) == b"tiled"
        version = int(z["__version__"])
        assert version == _FORMAT_VERSION, \
            f"unknown checkpoint version {version}"
        cfg_dict = json.loads(bytes(z["__config__"].tobytes()).decode())
        cfg_dict["gravity"] = tuple(cfg_dict["gravity"])
        return SimConfig(**cfg_dict)


def load_tiled_bigs(path: str):
    """(pids, positions, previous, radii) of the stored big-particle
    overlay, or None when the checkpoint has none."""
    with np.load(path) as z:
        if "big_pid" not in z:
            return None
        return (z["big_pid"], z["big_positions"], z["big_previous"],
                z["big_radii"])


def load_tiled_checkpoint(path: str, config: SimConfig | None = None):
    """Re-tile the stored particle arrays.  ``config`` overrides the
    stored one (geometry overrides re-tile accordingly)."""
    from gpu_physics_engine_tpu.ops import tiled

    with np.load(path) as z:
        assert bytes(z["__kind__"].tobytes()) == b"tiled"
        if config is None:
            cfg_dict = json.loads(bytes(z["__config__"].tobytes()).decode())
            cfg_dict["gravity"] = tuple(cfg_dict["gravity"])
            config = SimConfig(**cfg_dict)
        state = tiled.init_tiles(
            config, z["positions"], z["radii"], pids=z["pid"],
            previous_positions=z["previous_positions"])
        state = dataclasses.replace(
            state, overflow_count=state.overflow_count
            + jnp.asarray(z["overflow"], jnp.int32))
    return state, config
