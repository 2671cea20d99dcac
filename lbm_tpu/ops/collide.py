"""Pairwise-BGK collisions with Guo electric forcing and DDF thermal coupling.

Physics replicated from the reference (src/collisions.cpp):

Mass populations (per species s, per direction i):
    C_s  = - (f_s - feq_s)/tau_s - (f_s - feq_s_p1)/tau_sp1
                                 - (f_s - feq_s_p2)/tau_sp2
    F_s  = w_i q_s rho_s / (m_s cs2) (1 - 1/(2 tau_s)) *
             [ (c.E) + (c.u_s)(c.E)/cs2 - u_s.E ]        (charged only)
    f_s' = f_s + C_s + F_s

Thermal populations:
    term_ab = (2 rho_a (1-1/tau)^2 - 2 (1-1/tau) rho_a - Q feq_ab / tau)
              / (2 (2 (1-1/tau) + Q feq_ab / tau))
    DeltaE_a = rho_a (term_aa + term_ab + term_ac) |u_a|^2
    DeltaT_a = -DeltaE_a / Kb
    C_Ta = - (g_a - geq_a)/tau_a - (g_a - geq_ab)/tau_ab - (g_a - geq_ac)/tau_ac
    g_a' = g_a + C_Ta + DeltaT_a

where feq_ab = equilibrium(rho_a, u_ab) against the pairwise mixture
velocity (reference: src/collisions.cpp:86-114,154-173). The 18 equilibrium
fields the reference materializes are recomputed inline here; XLA fuses the
whole operator into a handful of elementwise kernels, and the Pallas path
evaluates it entirely in VMEM.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import D2Q9
from .equilibrium import equilibrium
from .macros import Macros

# Per-species (self, with-first-partner, with-second-partner) tau indices
# into the pair-velocity axis: species e pairs with (ei, en), i with (ei, in),
# n with (en, in).
_PAIR_IDX = ((0, 1), (0, 2), (1, 2))  # pair-axis index used by species s
_Q = D2Q9.Q


def collide(
    f: jnp.ndarray,   # (3, Q, NY, NX)
    g: jnp.ndarray,   # (3, Q, NY, NX)
    mac: Macros,
    Ex: jnp.ndarray,  # (NY, NX)
    Ey: jnp.ndarray,  # (NY, NX)
    *,
    taus: Tuple[float, float, float, float, float, float],
    q_e: float,
    q_i: float,
    m_e: float,
    m_i: float,
    cs2: float,
    kb: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One collision step; returns (f_post, g_post) (pre-streaming)."""
    dtype = f.dtype
    tau_e, tau_i, tau_n, tau_ei, tau_en, tau_in = taus
    tau_self = (tau_e, tau_i, tau_n)
    tau_cross = ((tau_ei, tau_en), (tau_ei, tau_in), (tau_en, tau_in))

    w = jnp.asarray(D2Q9.W, dtype)[:, None, None]
    cx = jnp.asarray(D2Q9.CX.astype(np.float64), dtype)[:, None, None]
    cy = jnp.asarray(D2Q9.CY.astype(np.float64), dtype)[:, None, None]

    rho, ux, uy, T = mac.rho, mac.ux, mac.uy, mac.T
    charge_over_mass = (q_e / m_e, q_i / m_i, 0.0)
    charge = (q_e, q_i, 0.0)
    mass = (m_e, m_i, 1.0)

    def thermal_term(rho_s, tau, feq):
        """Energy-loss factor term_ab (src/collisions.cpp:86-96)."""
        r = 1.0 - 1.0 / tau
        num = 2.0 * rho_s[None] * r * r - 2.0 * r * rho_s[None] - _Q * feq / tau
        den = 2.0 * (2.0 * r + _Q * feq / tau)
        return num / den

    f_out, g_out = [], []
    for s in range(3):
        p1, p2 = _PAIR_IDX[s]
        t_self = tau_self[s]
        t_c1, t_c2 = tau_cross[s]

        feq_self = equilibrium(rho[s], ux[s], uy[s], cs2)
        feq_p1 = equilibrium(rho[s], mac.ux_pair[p1], mac.uy_pair[p1], cs2)
        feq_p2 = equilibrium(rho[s], mac.ux_pair[p2], mac.uy_pair[p2], cs2)
        geq_self = equilibrium(T[s], ux[s], uy[s], cs2)
        geq_p1 = equilibrium(T[s], mac.ux_pair[p1], mac.uy_pair[p1], cs2)
        geq_p2 = equilibrium(T[s], mac.ux_pair[p2], mac.uy_pair[p2], cs2)

        # ---- thermal (DDF) update, done first like the reference ----
        term = (
            thermal_term(rho[s], t_self, feq_self)
            + thermal_term(rho[s], t_c1, feq_p1)
            + thermal_term(rho[s], t_c2, feq_p2)
        )
        u2 = (ux[s] * ux[s] + uy[s] * uy[s])[None]
        dT = -(rho[s][None] * term * u2) / kb
        C_T = (
            -(g[s] - geq_self) / t_self
            - (g[s] - geq_p1) / t_c1
            - (g[s] - geq_p2) / t_c2
        )
        g_out.append(g[s] + C_T + dT)

        # ---- mass update with Guo forcing on charged species ----
        C = (
            -(f[s] - feq_self) / t_self
            - (f[s] - feq_p1) / t_c1
            - (f[s] - feq_p2) / t_c2
        )
        if charge[s] != 0.0:
            cE = cx * Ex[None] + cy * Ey[None]
            cu = cx * ux[s][None] + cy * uy[s][None]
            uE = (ux[s] * Ex + uy[s] * Ey)[None]
            prefac = (
                w
                * (charge_over_mass[s] / cs2)
                * rho[s][None]
                * (1.0 - 1.0 / (2.0 * t_self))
            )
            F = prefac * (cE + cu * cE / cs2 - uE)
            f_out.append(f[s] + C + F)
        else:
            f_out.append(f[s] + C)

    return jnp.stack(f_out), jnp.stack(g_out)
