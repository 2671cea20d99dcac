"""Stage-granular plasma step for the debug-dump harness.

The reference's debug build dumps the full grid state after each of the 5
pipeline stages of every step (old codes/Plasma debug/
plasma_debug.cpp:1480-1557: UpdateMacro, ComputeEquilibrium, Collisions,
Streaming, SolvePoisson). The production step here fuses those stages (one
kernel / one XLA graph), so this module provides a separate jnp-backend
step that materializes a snapshot after every stage, for io.debug_dump to
write in the C++ dump's exact format.

Stale-buffer semantics are replicated so a dump diffs cleanly against the
C++ file line-for-line:
  * the 9 equilibrium sets are carried across steps (the C++ buffers are
    written in ComputeEquilibrium and stay stale through the next step's
    UpdateMacro dump; they start zeroed),
  * macros shown at Collisions/Streaming/SolvePoisson are the ones computed
    at this step's UpdateMacro,
  * E shown before SolvePoisson is the previous step's post-solve field,
    and the debug variant's step-0 pulse zeroing lands AFTER the
    SolvePoisson dump (plasma_debug.cpp:1558-1566).

Numerics are the ordinary jnp step's (same ops), so a full-precision run
matches the C++ debug build to print precision (%.6e), see
tests/test_reference_parity.py.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax.numpy as jnp

from ..config import BC, PlasmaConfig
from ..ops.collide import collide
from ..ops.equilibrium import equilibrium_from_polys, equilibrium_polys
from ..ops.macros import Macros, update_macro
from ..ops import stream as stream_ops
from ..ops.stream import stream_bounceback, stream_periodic
from .plasma import (PlasmaState, _g_holes_with_background, _solve_poisson)

# Dump order of the materialized equilibrium sets (plasma_debug.cpp's
# buffer names): f_eq_s = eq(rho_s, u_s); f_eq_a_b = eq(rho_a, u_ab) with
# the pairwise mixture velocity (pair axes: ei=0, en=1, in=2).
EQ_LABELS = ("f_eq_e", "f_eq_i", "f_eq_n",
             "f_eq_e_i", "f_eq_i_e", "f_eq_e_n",
             "f_eq_n_e", "f_eq_i_n", "f_eq_n_i")
# (species amplitude, velocity source): velocity -1 -> self, else pair axis
_EQ_SPEC = {"f_eq_e": (0, -1), "f_eq_i": (1, -1), "f_eq_n": (2, -1),
            "f_eq_e_i": (0, 0), "f_eq_i_e": (1, 0),
            "f_eq_e_n": (0, 1), "f_eq_n_e": (2, 1),
            "f_eq_i_n": (1, 2), "f_eq_n_i": (2, 2)}

STAGES = ("UpdateMacro", "ComputeEquilibrium", "Collisions",
          "Streaming", "SolvePoisson")


class StageSnapshot(NamedTuple):
    """Everything the C++ per-stage dump prints."""

    mac: Macros
    Ex: jnp.ndarray
    Ey: jnp.ndarray
    f: jnp.ndarray                      # (3, Q, NY, NX)
    feq: Dict[str, jnp.ndarray]         # label -> (Q, NY, NX)


def init_feq(cfg: PlasmaConfig) -> Dict[str, jnp.ndarray]:
    """The C++ equilibrium buffers start zeroed (allocated, not filled)."""
    z = jnp.zeros((9, cfg.NY, cfg.NX), cfg.dtype)
    return {k: z for k in EQ_LABELS}


def _materialize_eq(mac: Macros, cs2: float) -> Dict[str, jnp.ndarray]:
    polys_self = [equilibrium_polys(mac.ux[s], mac.uy[s], cs2)
                  for s in range(3)]
    polys_pair = [equilibrium_polys(mac.ux_pair[p], mac.uy_pair[p], cs2)
                  for p in range(3)]
    out = {}
    for label, (s, vel) in _EQ_SPEC.items():
        polys = polys_self[s] if vel < 0 else polys_pair[vel]
        out[label] = jnp.stack(equilibrium_from_polys(mac.rho[s], polys))
    return out


def make_staged_step(cfg: PlasmaConfig):
    """(state, feq_prev) -> (new_state, feq, {stage: StageSnapshot}).

    jnp backend only (the dump gate is tiny grids); native storage only —
    bf16-stored populations would dump deltas of rounded bits, not the
    C++-comparable fields.
    """
    if cfg.storage != "native":
        raise ValueError("staged debug step supports native storage only")
    u = cfg.units()
    periodic = cfg.bc == BC.PERIODIC
    debug_variant = cfg.compat.debug_variant
    guard_vals = ((0.01 * u.cs2, 0.00001 * u.cs2, 0.0) if debug_variant
                  else (0.0, 0.0, 0.0))
    neutral_ref = u.rho_n_init if cfg.neutral_delta else 0.0

    def staged(state: PlasmaState, feq_prev: Dict[str, jnp.ndarray]
               ) -> Tuple[PlasmaState, Dict[str, jnp.ndarray],
                          Dict[str, StageSnapshot]]:
        stages = {}
        mac = update_macro(state.f, state.g, state.Ex, state.Ey,
                           q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                           guard_vals=guard_vals, neutral_ref=neutral_ref)
        stages["UpdateMacro"] = StageSnapshot(mac, state.Ex, state.Ey,
                                              state.f, feq_prev)
        feq = _materialize_eq(mac, u.cs2)
        stages["ComputeEquilibrium"] = StageSnapshot(mac, state.Ex, state.Ey,
                                                     state.f, feq)
        f_post, g_post = collide(state.f, state.g, mac, state.Ex, state.Ey,
                                 taus=cfg.taus, q_e=u.q_e, q_i=u.q_i,
                                 m_e=u.m_e, m_i=u.m_i, cs2=u.cs2, kb=u.kb,
                                 neutral_ref=neutral_ref)
        stages["Collisions"] = StageSnapshot(mac, state.Ex, state.Ey,
                                             f_post, feq)
        if periodic:
            f = stream_periodic(f_post)
            g = stream_periodic(g_post)
        else:
            # same quirk replication as models/plasma.py make_step
            f = stream_bounceback(f_post, stale=state.f)
            if debug_variant:
                g = stream_bounceback(g_post, stale=state.g)
            else:
                g_holes = _g_holes_with_background(
                    stream_ops.hole_values(f_post), neutral_ref)
                g = stream_ops.bounceback_from_periodic(
                    stream_periodic(g_post), g_holes)
        stages["Streaming"] = StageSnapshot(mac, state.Ex, state.Ey, f, feq)
        Ex, Ey, phi = _solve_poisson(cfg, mac.rho_q, state.phi,
                                     state.Ex, state.Ey)
        stages["SolvePoisson"] = StageSnapshot(mac, Ex, Ey, f, feq)
        if debug_variant:
            # pulsed external field: zeroed after the step-0 SolvePoisson
            # dump (plasma_debug.cpp:1558-1566)
            first = state.step == 0
            Ex = jnp.where(first, 0.0, Ex)
            Ey = jnp.where(first, 0.0, Ey)
        new_state = PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=phi,
                                step=state.step + 1)
        return new_state, feq, stages

    return staged
