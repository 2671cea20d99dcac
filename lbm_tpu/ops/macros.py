"""Macroscopic moment update for the three-population plasma.

Replicates the semantics of the reference's UpdateMacro
(reference: src/plasma.cpp:317-456):

    rho_s = sum_i f_s_i
    u_s   = sum_i f_s_i c_i / rho_s  + (1/2) q_s E / m_s      (charged s only)
    T_s   = sum_i g_s_i

with three stability guards that are part of the golden trajectory:
  * rho_s < 1e-10   -> cell zeroed (rho, u, T)
  * momentum == +/-rho (exact fp equality) -> that velocity component zeroed
    (catches cells just seeded by streaming where all mass moves one way)
  * rho_q < 1e-15   -> 0 (note: clamps *negative* charge density too; the
    reference's comparison is signed, not abs)

plus the pairwise density-weighted mixture velocities u_ei, u_en, u_in and
the lattice charge density rho_q = q_i rho_i / m_i + q_e rho_e / m_e.

Moment sums accumulate sequentially in direction order 0..8 — the same
reduction tree as the reference's serial loop — so the exact-equality guard
fires on identical inputs. All stencil constants are scalars (Pallas-safe).

Species axis order everywhere: 0=electron, 1=ion, 2=neutral.
Pair axis order: 0=(e,i), 1=(e,n), 2=(i,n).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import D2Q9

_CX = [float(c) for c in D2Q9.CX]
_CY = [float(c) for c in D2Q9.CY]
_Q = D2Q9.Q


class Macros(NamedTuple):
    rho: jnp.ndarray      # (3, NY, NX) guarded densities
    ux: jnp.ndarray       # (3, NY, NX)
    uy: jnp.ndarray       # (3, NY, NX)
    T: jnp.ndarray        # (3, NY, NX), or None when g was not supplied
    ux_pair: jnp.ndarray  # (3, NY, NX) — (ei, en, in)
    uy_pair: jnp.ndarray  # (3, NY, NX)
    rho_q: jnp.ndarray    # (NY, NX)
    rho_raw: jnp.ndarray = None  # (3, NY, NX) pre-guard momentum-sum density
    # neutral density deviation Sum_i delta_i when f[2] is stored as a delta
    # from the uniform background rho_ref * w_i (cfg.neutral_delta); None in
    # classic mode. Kept separately because rho - rho_ref would cancel.
    drho_n: jnp.ndarray = None


def _c(v, like):
    """Scalar constant in `like`'s dtype. jnp.where materializes Python
    floats as default-dtype scalars, which under jax_enable_x64 puts f64[]
    constants inside the Pallas kernel traces — Mosaic has no f64 and its
    convert lowering recurses to a RecursionError. Exact for 0/1/guard
    values in every dtype, so bitwise-neutral everywhere else."""
    return jnp.asarray(v, like.dtype)


def _sum_dirs(a_s):
    """Sequential 0..8 accumulation (the reference's reduction order)."""
    acc = a_s[0]
    for i in range(1, _Q):
        acc = acc + a_s[i]
    return acc


def _moments(f_s):
    """rho, px, py for one species (sequential 0..8 order)."""
    rho = _sum_dirs(f_s)
    px = None
    py = None
    for i in range(_Q):
        if _CX[i] != 0.0:
            term = f_s[i] if _CX[i] > 0 else -f_s[i]
            px = term if px is None else px + term
        if _CY[i] != 0.0:
            term = f_s[i] if _CY[i] > 0 else -f_s[i]
            py = term if py is None else py + term
    return rho, px, py


def _mixture_velocities(rho_raw, alive, ux, uy):
    """Pairwise density-weighted mixture velocities: raw densities as
    weights, guarded velocities, zeroed only when BOTH raw densities are
    dead (reference: src/plasma.cpp:426-449)."""
    uxp, uyp = [], []
    for a, b in ((0, 1), (0, 2), (1, 2)):
        ra, rb = rho_raw[a], rho_raw[b]
        both_dead = (~alive[a]) & (~alive[b])
        inv = 1.0 / jnp.where(both_dead, _c(1.0, ra), ra + rb)
        uxp.append(jnp.where(both_dead, _c(0.0, ra), (ra * ux[a] + rb * ux[b]) * inv))
        uyp.append(jnp.where(both_dead, _c(0.0, ra), (ra * uy[a] + rb * uy[b]) * inv))
    return uxp, uyp


def update_macro(
    f: jnp.ndarray,        # (3, Q, NY, NX)
    g: jnp.ndarray,        # (3, Q, NY, NX)
    Ex: jnp.ndarray,       # (NY, NX)
    Ey: jnp.ndarray,       # (NY, NX)
    *,
    q_e: float,
    q_i: float,
    m_e: float,
    m_i: float,
    guard_vals: tuple = (0.0, 0.0, 0.0),
    neutral_ref: float = 0.0,
) -> Macros:
    """guard_vals: the per-species value the momentum==+/-rho guard assigns
    (0 in the final reference; 0.01*cs2 / 1e-5*cs2 / 0 in the debug
    predecessor variant).

    neutral_ref != 0 enables the neutral delta-storage mode: f[2] holds
    deviations delta_i from the uniform background neutral_ref * w_i, so
    rho_n = neutral_ref + Sum_i delta_i and the momenta come from the
    deltas directly — cancellation-free where the classic f32 path loses
    the entire neutral velocity signal to rounding (rho_n ~ 1.8e10 lattice
    units at the golden parameters)."""
    qom = (q_e / m_e, q_i / m_i, 0.0)

    rho_raw, rho_l, ux_l, uy_l, T_l, alive_l = [], [], [], [], [], []
    drho_n = None
    for s in range(3):
        rho, px, py = _moments(f[s])
        if s == 2 and neutral_ref != 0.0:
            drho_n = rho
            rho = neutral_ref + rho
        alive = rho >= 1e-10
        safe_rho = jnp.where(alive, rho, _c(1.0, rho))
        inv_rho = 1.0 / safe_rho  # one division shared by both components
        # exact-equality anti-blowup guard (reference: src/plasma.cpp:380-387)
        gv = guard_vals[s]
        ux = jnp.where((px == rho) | (px == -rho), _c(gv, rho), px * inv_rho)
        uy = jnp.where((py == rho) | (py == -rho), _c(gv, rho), py * inv_rho)
        if qom[s] != 0.0:
            # half-step Guo force correction (src/plasma.cpp:389-390)
            ux = ux + (0.5 * qom[s]) * Ex
            uy = uy + (0.5 * qom[s]) * Ey
        rho_raw.append(rho)
        alive_l.append(alive)
        rho_l.append(jnp.where(alive, rho, _c(0.0, rho)))
        ux_l.append(jnp.where(alive, ux, _c(0.0, rho)))
        uy_l.append(jnp.where(alive, uy, _c(0.0, rho)))
        if g is not None:
            T_l.append(jnp.where(alive, _sum_dirs(g[s]), _c(0.0, rho)))

    uxp, uyp = _mixture_velocities(rho_raw, alive_l, ux_l, uy_l)

    # charge density with the signed < 1e-15 clamp (src/plasma.cpp:452-453)
    rho_q = (q_i / m_i) * rho_l[1] + (q_e / m_e) * rho_l[0]
    rho_q = jnp.where(rho_q < 1e-15, _c(0.0, rho_q), rho_q)

    return Macros(
        rho=jnp.stack(rho_l), ux=jnp.stack(ux_l), uy=jnp.stack(uy_l),
        T=jnp.stack(T_l) if g is not None else None,
        ux_pair=jnp.stack(uxp), uy_pair=jnp.stack(uyp),
        rho_q=rho_q, rho_raw=jnp.stack(rho_raw), drho_n=drho_n,
    )


def macros_from_pack(pack, g, guard_vals=(0.0, 0.0, 0.0)) -> Macros:
    """Rebuild the Macros needed by the thermal (g) side from the mass
    kernel's pack: pack = stack([rho_raw(3), ux(3), uy(3)]) -> (9, NY, NX).

    The guard masks, guarded densities, T moments and mixture velocities
    are recomputed locally (cheap) instead of shipping 6 more planes of
    pack through HBM. guard_vals is unused here (the velocities in the
    pack already carry the guard) but kept for signature symmetry.
    """
    rho_raw = [pack[s] for s in range(3)]
    ux = [pack[3 + s] for s in range(3)]
    uy = [pack[6 + s] for s in range(3)]
    alive = [r >= 1e-10 for r in rho_raw]
    rho = [jnp.where(a, r, _c(0.0, r)) for a, r in zip(alive, rho_raw)]
    T = [jnp.where(a, _sum_dirs(g[s]), _c(0.0, g[s][0])) for s, a in enumerate(alive)]
    uxp, uyp = _mixture_velocities(rho_raw, alive, ux, uy)
    return Macros(
        rho=jnp.stack(rho), ux=jnp.stack(ux), uy=jnp.stack(uy),
        T=jnp.stack(T), ux_pair=jnp.stack(uxp), uy_pair=jnp.stack(uyp),
        rho_q=None, rho_raw=jnp.stack(rho_raw),
    )
