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

Species axis order everywhere: 0=electron, 1=ion, 2=neutral.
Pair axis order: 0=(e,i), 1=(e,n), 2=(i,n).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..constants import D2Q9


class Macros(NamedTuple):
    rho: jnp.ndarray      # (3, NY, NX)
    ux: jnp.ndarray       # (3, NY, NX)
    uy: jnp.ndarray       # (3, NY, NX)
    T: jnp.ndarray        # (3, NY, NX)
    ux_pair: jnp.ndarray  # (3, NY, NX) — (ei, en, in)
    uy_pair: jnp.ndarray  # (3, NY, NX)
    rho_q: jnp.ndarray    # (NY, NX)


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
) -> Macros:
    dtype = f.dtype
    cx = jnp.asarray(D2Q9.CX.astype(np.float64), dtype)[None, :, None, None]
    cy = jnp.asarray(D2Q9.CY.astype(np.float64), dtype)[None, :, None, None]

    rho_raw = jnp.sum(f, axis=1)             # (3, NY, NX)
    px = jnp.sum(f * cx, axis=1)             # momentum sums
    py = jnp.sum(f * cy, axis=1)
    T_raw = jnp.sum(g, axis=1)

    alive = rho_raw >= 1e-10                 # per-species cell-is-alive mask
    safe_rho = jnp.where(alive, rho_raw, 1.0)

    # velocity with the exact-equality anti-blowup guard
    # (reference: src/plasma.cpp:380-387)
    ux = jnp.where((px == rho_raw) | (px == -rho_raw), 0.0, px / safe_rho)
    uy = jnp.where((py == rho_raw) | (py == -rho_raw), 0.0, py / safe_rho)

    # half-step Guo force correction on charged species only
    # (reference: src/plasma.cpp:389-390,409-410)
    qom = jnp.asarray(
        np.array([q_e / m_e, q_i / m_i, 0.0]), dtype
    )[:, None, None]
    ux = ux + 0.5 * qom * Ex[None]
    uy = uy + 0.5 * qom * Ey[None]

    rho = jnp.where(alive, rho_raw, 0.0)
    ux = jnp.where(alive, ux, 0.0)
    uy = jnp.where(alive, uy, 0.0)
    T = jnp.where(alive, T_raw, 0.0)

    # Pairwise density-weighted mixture velocities. The reference weights by
    # the *raw* momentum-sum densities (rho_loc) but the *guarded* velocities
    # (reference: src/plasma.cpp:426-449), and only zeroes a pair when BOTH
    # raw densities are below threshold.
    pairs = ((0, 1), (0, 2), (1, 2))
    uxp, uyp = [], []
    for a, b in pairs:
        ra, rb = rho_raw[a], rho_raw[b]
        both_dead = (~alive[a]) & (~alive[b])
        denom = jnp.where(both_dead, 1.0, ra + rb)
        uxp.append(jnp.where(both_dead, 0.0, (ra * ux[a] + rb * ux[b]) / denom))
        uyp.append(jnp.where(both_dead, 0.0, (ra * uy[a] + rb * uy[b]) / denom))
    ux_pair = jnp.stack(uxp)
    uy_pair = jnp.stack(uyp)

    # charge density with the signed < 1e-15 clamp (src/plasma.cpp:452-453)
    rho_q = q_i * rho[1] / m_i + q_e * rho[0] / m_e
    rho_q = jnp.where(rho_q < 1e-15, 0.0, rho_q)

    return Macros(rho=rho, ux=ux, uy=uy, T=T,
                  ux_pair=ux_pair, uy_pair=uy_pair, rho_q=rho_q)
