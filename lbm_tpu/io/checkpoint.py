"""Checkpoint / resume for the simulation state.

The reference has none (SURVEY.md section 5.4) — state lives in RAM for the
run. Here the whole PlasmaState (f, g, Ex, Ey, phi, step) round-trips
through orbax when available, with a plain .npz fallback, so any run is
resumable mid-trajectory.

Layout metadata: the npz records how the populations are stored —
``neutral_delta`` (is f[2] deviations from the uniform background?) and
``storage`` (native/bf16, also evident from the tagged bf16 keys) — so a
resume can detect a layout mismatch instead of silently reinterpreting
full neutral populations as deltas (which would double rho_n).
``convert_neutral_layout`` converts between the two layouts exactly
(the background rho_n_init * w_i is added/subtracted in float64).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.plasma import PlasmaState

_FIELDS = PlasmaState._fields

# npz keys carrying layout metadata rather than state arrays
_META_DELTA = "__meta_neutral_delta"
_META_STORAGE = "__meta_storage"


def _save(path: str, state, fields, *,
          neutral_delta: Optional[bool] = None,
          storage: Optional[str] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if len(tuple(state)) != len(fields):
        # e.g. a Plasma3DState passed to the 2-D save: a silent zip would
        # mislabel fields and drop the tail — corrupt only at resume time
        raise ValueError(f"state has {len(tuple(state))} fields, "
                         f"checkpoint schema expects {len(fields)}")
    arrays = {}
    for k, v in zip(fields, state):
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            # npz has no bfloat16 (it round-trips as void V2 and breaks on
            # reload): store the raw bits as uint16 under a tagged key
            arrays[k + "__bf16"] = a.view(np.uint16)
        else:
            arrays[k] = a
    if neutral_delta is not None:
        arrays[_META_DELTA] = np.asarray(int(neutral_delta), np.int8)
    if storage is not None:
        arrays[_META_STORAGE] = np.asarray(storage, np.str_)
    np.savez_compressed(path, **arrays)


def save(path: str, state: PlasmaState, *,
         neutral_delta: Optional[bool] = None,
         storage: Optional[str] = None) -> None:
    _save(path, state, _FIELDS, neutral_delta=neutral_delta, storage=storage)


def load_meta(path: str) -> dict:
    """Layout metadata recorded in the checkpoint (empty for pre-metadata
    files — those predate the layout tagging and must be declared by the
    caller, see run_plasma.py --assume-ckpt-layout)."""
    meta = {}
    with np.load(path) as z:
        if _META_DELTA in z:
            meta["neutral_delta"] = bool(z[_META_DELTA])
        if _META_STORAGE in z:
            meta["storage"] = str(z[_META_STORAGE])
    return meta


def _load(path: str, state_cls, dtype=None, device=None):
    with np.load(path) as z:
        vals = []
        for k in state_cls._fields:
            if k + "__bf16" in z:
                bits = z[k + "__bf16"]
                a = bits.view(jnp.bfloat16)
                if dtype is not None:
                    # an explicit dtype request wins (e.g. loading a bf16
                    # checkpoint at f64 for analysis); bf16 storage stays
                    # bf16 only for dtype=None
                    a = a.astype(dtype)
            else:
                a = z[k]
                if dtype is not None and a.dtype.kind == "f":
                    a = a.astype(dtype)
            vals.append(jnp.asarray(a))
    state = state_cls(*vals)
    if device is not None:
        state = jax.device_put(state, device)
    return state


def load(path: str, dtype=None, device=None) -> PlasmaState:
    return _load(path, PlasmaState, dtype, device)


def save3d(path: str, state, *, neutral_delta: Optional[bool] = None,
           storage: Optional[str] = None) -> None:
    """Plasma3DState variant (f, g, Ex, Ey, Ez, phi, step)."""
    from ..models.plasma3d import Plasma3DState

    _save(path, state, Plasma3DState._fields,
          neutral_delta=neutral_delta, storage=storage)


def load3d(path: str, dtype=None, device=None):
    from ..models.plasma3d import Plasma3DState

    return _load(path, Plasma3DState, dtype, device)


def save_cavity(path: str, state, *, storage: Optional[str] = None) -> None:
    """CavityState variant (f, rho, ux, uy, step). ``storage`` records the
    population layout: "bf16" means f holds bfloat16 DELTAS from the
    uniform background w_i (CavityConfig.storage)."""
    from ..models.cavity import CavityState

    _save(path, state, CavityState._fields, storage=storage)


def load_cavity(path: str, dtype=None, device=None):
    from ..models.cavity import CavityState

    return _load(path, CavityState, dtype, device)


def reconcile_cavity_state(state, path: str, cfg):
    """Convert a loaded cavity checkpoint to cfg's storage layout.

    The bf16 cavity layout stores f as deviations from w_i, so a storage
    mismatch is a LAYOUT mismatch (deltas reinterpreted as populations or
    vice versa), not just a dtype one — converted exactly here via the
    models/cavity encode/decode pair. Metadata-less checkpoints are
    declared native (the only layout that predates the tagging)."""
    from ..models import cavity as _cav
    from ..models.cavity import CavityState

    ck = load_meta(path).get("storage", "native")
    if ck == cfg.storage:
        if cfg.storage == "bf16":
            return state  # f is bf16 by construction; macros load as f32
        # same layout but possibly a different run dtype (f64 ckpt into an
        # f32 run or vice versa)
        return CavityState(
            f=state.f.astype(cfg.dtype), rho=state.rho.astype(cfg.dtype),
            ux=state.ux.astype(cfg.dtype), uy=state.uy.astype(cfg.dtype),
            step=state.step)
    # cross-layout: decode/encode inline rather than via a storage-swapped
    # config copy — CavityConfig.__post_init__ rejects bf16+f64, which
    # would make a bf16 checkpoint unresumable into an f64 native run
    if ck == "bf16":
        f_full = (state.f.astype(jnp.float32)
                  + _cav._w_bg(jnp.float32)).astype(cfg.dtype)
    else:
        f_full = state.f
    return CavityState(
        f=_cav.encode_f(cfg, f_full),
        rho=state.rho.astype(cfg.dtype), ux=state.ux.astype(cfg.dtype),
        uy=state.uy.astype(cfg.dtype), step=state.step)


def convert_neutral_layout(state: PlasmaState, *, to_delta: bool,
                           rho_n_ref: float) -> PlasmaState:
    """Convert f[2] between the classic and delta neutral layouts.

    classic -> delta subtracts the uniform background rho_n_ref * w_i per
    direction; delta -> classic adds it. The arithmetic runs in float64 (the
    background is ~1.8e10 lattice units at the golden scaling) and is cast
    back to the stored dtype, so the conversion is exact at storage
    precision. Works for D2Q9 (Q=9) and D3Q19 (Q=19) population stacks.
    """
    from ..constants import D2Q9, D3Q19

    f = state.f
    Q = f.shape[1]
    W = {9: D2Q9.W, 19: D3Q19.W}[Q]
    bg = (np.asarray(W, np.float64) * float(rho_n_ref))
    bg = bg.reshape((Q,) + (1,) * (f.ndim - 2))
    sign = -1.0 if to_delta else 1.0
    # host-side numpy so the +-1.8e10 background arithmetic is true f64
    # regardless of the jax_enable_x64 flag
    f_n = np.asarray(f[2]).astype(np.float64) + sign * bg
    # numpy handles the cast back (incl. bfloat16 via ml_dtypes), so the
    # rounding is a single f64 -> storage-dtype step
    f_n = jnp.asarray(f_n.astype(np.dtype(f.dtype)))
    return state._replace(f=f.at[2].set(f_n))


def reconcile_resumed_state(state, path: str, cfg, *,
                            assume_layout: Optional[str] = None,
                            log=print):
    """Make a loaded checkpoint's layout/dtype match cfg before stepping.

    Shared by the 2-D and 3-D drivers' --resume paths. Reconciles
      * the NEUTRAL LAYOUT (classic full populations vs deltas from the
        uniform background): read from the checkpoint's metadata, or from
        `assume_layout` ("classic"|"delta") for pre-metadata files —
        refuses with a clear error when neither is available (silently
        reinterpreting full populations as deltas would double rho_n);
      * the POPULATION DTYPE with cfg.storage (a bf16 checkpoint resumed
        at native storage is upcast bit-exactly, and vice versa).
    """
    meta = load_meta(path)
    ckpt_delta = meta.get("neutral_delta")
    if ckpt_delta is None and assume_layout:
        ckpt_delta = assume_layout == "delta"
    if ckpt_delta is None:
        raise ValueError(
            f"{path} predates layout metadata; declare its neutral layout "
            f"via assume_layout='classic'|'delta' (CLI: "
            f"--assume-ckpt-layout). classic = full neutral populations, "
            f"the pre-metadata default; delta = deviations from the "
            f"uniform background")
    if ckpt_delta != cfg.neutral_delta:
        log(f"resume: converting neutral layout "
            f"{'delta' if ckpt_delta else 'classic'} -> "
            f"{'delta' if cfg.neutral_delta else 'classic'}")
        state = convert_neutral_layout(
            state, to_delta=cfg.neutral_delta,
            rho_n_ref=cfg.units().rho_n_init)
    want = jnp.bfloat16 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype)
    if state.f.dtype != want:
        log(f"resume: converting populations "
            f"{state.f.dtype} -> {jnp.dtype(want).name}")
        state = state._replace(f=state.f.astype(want),
                               g=state.g.astype(want))
    return state


def save_orbax(path: str, state) -> None:
    """Orbax variant (sharding-aware, async-capable). Accepts any of the
    NamedTuple states (PlasmaState, Plasma3DState, CavityState)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state._asdict(), force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template=None, state_cls=PlasmaState):
    """Restore an orbax checkpoint. ``state_cls`` selects the state type
    (default PlasmaState; pass models.cavity.CavityState etc.)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = template._asdict() if template is not None else None
    restored = ckptr.restore(os.path.abspath(path), target)
    return state_cls(**restored)
