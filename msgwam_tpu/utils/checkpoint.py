"""Checkpoint / resume for the simulation state.

The reference holds its entire history in RAM and never writes anything to
disk (``raytracer.py:124-136``, plot-only output at ``raytracer.py:290``).
Here the full carry — state pytree, per-ray statics incl. the activity
mask, step counter, optional RNG key — round-trips through a single
``.npz`` (no external deps; orbax is available in the image but npz keeps
restarts dependency-free and portable)."""

from __future__ import annotations

import json
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..state import MeanState, RayState, RayStatics, State


_MANIFEST_KEY = "__msgwam_manifest__"


def save_checkpoint(
    path,
    state: State,
    statics: RayStatics,
    step: int = 0,
    key: Optional[jax.Array] = None,
    extra: Optional[dict] = None,
) -> None:
    """Serialize the simulation carry to ``path`` (.npz)."""
    arrays = {}
    for name, val in zip(RayState._fields, state.rays):
        arrays[f"rays.{name}"] = np.asarray(val)
    for name, val in zip(MeanState._fields, state.mean):
        arrays[f"mean.{name}"] = np.asarray(val)
    for name, val in zip(RayStatics._fields, statics):
        arrays[f"statics.{name}"] = np.asarray(val)
    if key is not None:
        arrays["key"] = np.asarray(jax.random.key_data(key))
    manifest = {"step": int(step), "version": 1, "extra": extra or {}}
    arrays[_MANIFEST_KEY] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path) -> Tuple[State, RayStatics, int, Optional[jax.Array], dict]:
    """Restore ``(state, statics, step, key, extra)`` from ``path``."""
    with np.load(path) as z:
        manifest = json.loads(bytes(z[_MANIFEST_KEY]).decode())
        rays = RayState(*(jnp.asarray(z[f"rays.{n}"]) for n in RayState._fields))
        mean = MeanState(*(jnp.asarray(z[f"mean.{n}"]) for n in MeanState._fields))
        statics = RayStatics(
            *(jnp.asarray(z[f"statics.{n}"]) for n in RayStatics._fields)
        )
        key = None
        if "key" in z.files:
            key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return (
        State(rays, mean),
        statics,
        manifest["step"],
        key,
        manifest.get("extra", {}),
    )
