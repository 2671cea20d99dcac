"""Checkpoint / resume for the simulation state.

The reference has none (SURVEY.md section 5.4) — state lives in RAM for the
run. Here the whole PlasmaState (f, g, Ex, Ey, phi, step) round-trips
through orbax when available, with a plain .npz fallback, so any run is
resumable mid-trajectory.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.plasma import PlasmaState

_FIELDS = PlasmaState._fields


def save(path: str, state: PlasmaState) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for k, v in zip(_FIELDS, state):
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            # npz has no bfloat16 (it round-trips as void V2 and breaks on
            # reload): store the raw bits as uint16 under a tagged key
            arrays[k + "__bf16"] = a.view(np.uint16)
        else:
            arrays[k] = a
    np.savez_compressed(path, **arrays)


def load(path: str, dtype=None, device=None) -> PlasmaState:
    with np.load(path) as z:
        vals = []
        for k in _FIELDS:
            if k + "__bf16" in z:
                bits = z[k + "__bf16"]
                a = bits.view(jnp.bfloat16)  # bf16 storage stays bf16
            else:
                a = z[k]
                if dtype is not None and a.dtype.kind == "f":
                    a = a.astype(dtype)
            vals.append(jnp.asarray(a))
    state = PlasmaState(*vals)
    if device is not None:
        state = jax.device_put(state, device)
    return state


def save_orbax(path: str, state: PlasmaState) -> None:
    """Orbax variant (sharding-aware, async-capable)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state._asdict(), force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Optional[PlasmaState] = None) -> PlasmaState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = template._asdict() if template is not None else None
    restored = ckptr.restore(os.path.abspath(path), target)
    return PlasmaState(**restored)
