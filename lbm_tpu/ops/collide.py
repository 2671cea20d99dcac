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
whole operator, and the Pallas kernel evaluates it entirely in VMEM. The
direction loop is unrolled with scalar stencil constants (Pallas-safe: no
captured array constants).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..constants import D2Q9
from .equilibrium import equilibrium_wpolys, equilibrium_wpolys_dev
from .macros import Macros, _c

_W = [float(w) for w in D2Q9.W]
_CX = [float(c) for c in D2Q9.CX]
_CY = [float(c) for c in D2Q9.CY]
_Q = D2Q9.Q

# species s collides with itself and with its two partners; pair-velocity
# axis order is (ei, en, in)
_PAIR_IDX = ((0, 1), (0, 2), (1, 2))


def _species_setup(s, mac, cs2, taus, pair_polys, self_wpolys=None):
    """Shared per-species precomputation for the f- and g-side collisions."""
    tau_e, tau_i, tau_n, tau_ei, tau_en, tau_in = taus
    tau_self = (tau_e, tau_i, tau_n)
    tau_cross = ((tau_ei, tau_en), (tau_ei, tau_in), (tau_en, tau_in))
    p1, p2 = _PAIR_IDX[s]
    t_self = tau_self[s]
    t_c1, t_c2 = tau_cross[s]
    invs = (1.0 / t_self, 1.0 / t_c1, 1.0 / t_c2)

    # Every equilibrium is consumed divided by its relaxation time (BGK) or
    # multiplied by Q/tau (thermal), so 1/tau is folded into the amplitudes
    # and the lattice weight into the shared polynomials:
    # eqd = (amp/tau) * (w * poly) = eq/tau. Algebraically identical to the
    # reference expressions; rounding differs in last bits.
    wpoly_self = (self_wpolys if self_wpolys is not None
                  else equilibrium_wpolys(mac.ux[s], mac.uy[s], cs2))
    if pair_polys is None:
        pair_polys = {
            p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p], cs2)
            for p in (p1, p2)
        }
    wp = (wpoly_self, pair_polys[p1], pair_polys[p2])
    keep = 1.0 - (invs[0] + invs[1] + invs[2])
    return t_self, invs, wp, keep


def collide_species_f_dirs(
    s, f_s, mac, Ex, Ey, *,
    taus, q_e, q_i, m_e, m_i, cs2,
    pair_polys=None, self_wpolys=None, neutral_ref=0.0,
):
    """Mass-population update for species s (never reads g/T).

    With neutral_ref != 0 the neutral populations are deltas from the
    uniform background neutral_ref * w_i, and the relaxation is rewritten
    exactly in delta form (subtract rho_ref w_i from both sides; the BGK
    sum satisfies Sum_p inv_p = 1 - keep):

        delta'_i = keep * delta_i + Sum_p inv_p (feq_p,i - rho_ref w_i)
        feq_p,i - rho_ref w_i = rho_n * wdev_p,i + drho_n * w_i

    with wdev the factored deviation polynomials — no large-number
    cancellation anywhere (reference math: src/collisions.cpp:118-152;
    algebraically identical, rounding moved off the 1.8e10 background).
    """
    charge = (q_e, q_i, 0.0)
    mass = (m_e, m_i, 1.0)
    t_self, invs, wp, keep = _species_setup(s, mac, cs2, taus, pair_polys,
                                            self_wpolys)
    rho_s, ux_s, uy_s = mac.rho[s], mac.ux[s], mac.uy[s]
    amp_f = tuple(rho_s * inv for inv in invs)

    if s == 2 and neutral_ref != 0.0:
        p1, p2 = _PAIR_IDX[s]
        wdev = (equilibrium_wpolys_dev(ux_s, uy_s, cs2),
                equilibrium_wpolys_dev(mac.ux_pair[p1], mac.uy_pair[p1], cs2),
                equilibrium_wpolys_dev(mac.ux_pair[p2], mac.uy_pair[p2], cs2))
        damp = mac.drho_n * (1.0 - keep)
        return [f_s[i] * keep
                + amp_f[0] * wdev[0][i] + amp_f[1] * wdev[1][i]
                + amp_f[2] * wdev[2][i] + damp * _W[i]
                for i in range(_Q)]

    charged = charge[s] != 0.0
    if charged:
        uE = ux_s * Ex + uy_s * Ey
        force_amp = (charge[s] / mass[s] / cs2) * rho_s * (
            1.0 - 1.0 / (2.0 * t_self))

    f_dirs = []
    for i in range(_Q):
        feqd = amp_f[0] * wp[0][i] + amp_f[1] * wp[1][i] + amp_f[2] * wp[2][i]
        relax = f_s[i] * keep + feqd
        if charged:
            cE = _CX[i] * Ex + _CY[i] * Ey
            cu = _CX[i] * ux_s + _CY[i] * uy_s
            F = (_W[i] * force_amp) * (cE + cu * cE / cs2 - uE)
            f_dirs.append(relax + F)
        else:
            f_dirs.append(relax)
    return f_dirs


def collide_species_g_dirs(
    s, g_s, mac, *,
    taus, cs2, kb,
    pair_polys=None, self_wpolys=None,
):
    """Thermal (DDF) update for species s; needs only macros, not f or E."""
    t_self, invs, wp, keep = _species_setup(s, mac, cs2, taus, pair_polys,
                                            self_wpolys)
    rho_s, ux_s, uy_s, T_s = mac.rho[s], mac.ux[s], mac.uy[s], mac.T[s]
    amp_f = tuple(rho_s * inv for inv in invs)
    amp_g = tuple(T_s * inv for inv in invs)

    # Thermal energy-loss terms (src/collisions.cpp:86-96):
    #   term_p = (2 rho r^2 - 2 r rho - Q feq/tau) / (2 (2 r + Q feq/tau))
    # combined over a common denominator: one division per (species,
    # direction) instead of three (VPU division throughput is the
    # bottleneck). a_p = rho (2r^2 - 2r) is per-cell, hoisted.
    tt = []
    for inv in invs:
        r = 1.0 - inv
        tt.append(((2.0 * r * r - 2.0 * r) * rho_s, 4.0 * r))
    u2 = ux_s * ux_s + uy_s * uy_s
    dT_amp = -(rho_s * u2) / kb  # per-cell factor of the heating source

    g_dirs = []
    for i in range(_Q):
        geqd = amp_g[0] * wp[0][i] + amp_g[1] * wp[1][i] + amp_g[2] * wp[2][i]
        ns, ds = [], []
        for p in range(3):
            qf = _Q * (amp_f[p] * wp[p][i])   # = Q feq_p / tau_p
            ns.append(tt[p][0] - qf)
            ds.append(tt[p][1] + 2.0 * qf)
        d12 = ds[0] * ds[1]
        tm = (ns[0] * (ds[1] * ds[2]) + ns[1] * (ds[0] * ds[2])
              + ns[2] * d12) / (d12 * ds[2])
        g_dirs.append(g_s[i] * keep + geqd + dT_amp * tm)
    return g_dirs


def collide_species_g_dirs_fast(
    s, g_s, mac, *,
    taus, cs2, kb, recip,
    pair_polys=None, self_wpolys=None,
):
    """Thermal update with the energy-loss term in partial-fraction form.

    Algebraically identical to collide_species_g_dirs:

        ns/ds = (a - q)/(b + 2q) = -1/2 + C / (q + b/2),
        C = (a + b/2)/2 = rho (r^2 - r) + r   (per-cell, hoisted)

    so tm = -3/2 + Sum_p C_p * recip(q_p + 2 r_p) — one shallow
    reciprocal per pair instead of the common-denominator chain (5 muls +
    1 serial division per direction). `recip` supplies the reciprocal:
    pl.reciprocal(approx=True) in the Pallas kernels (~1.6e-5 rel, the
    same magnitude as one bf16 storage rounding), exact 1/x on the jnp
    path. Used by the bf16-storage fast mode only — the native path keeps
    the original form, whose rounding is part of the golden trajectory.

    Degenerate cells match the original form wherever the original is
    finite (r_p = 0 gives C_p = 0 and an exact -1/2 contribution; dead
    cells with r_p != 0 give exactly 0).
    """
    t_self, invs, wp, keep = _species_setup(s, mac, cs2, taus, pair_polys,
                                            self_wpolys)
    rho_s, ux_s, uy_s, T_s = mac.rho[s], mac.ux[s], mac.uy[s], mac.T[s]
    amp_f = tuple(rho_s * inv for inv in invs)

    # Pairs with tau = 1 (r = 0) contribute C_p = 0, i.e. an exact -1/2:
    # skip their reciprocal+fma at trace time (the golden taus have
    # tau_n = 1, so the neutral species drops a third of its tm chain).
    # Bitwise-identical wherever populations are alive, and it removes the
    # latent 0 * recip(0) = NaN in dead cells of an r = 0 pair.
    active = [p for p in range(3) if (1.0 - invs[p]) != 0.0]
    cs, offs = {}, {}
    for p in active:
        r = 1.0 - invs[p]
        cs[p] = rho_s * (r * r - r) + r      # C_p, per-cell
        offs[p] = 2.0 * r                    # b_p / 2, scalar
    u2 = ux_s * ux_s + uy_s * uy_s
    dT_amp = -(rho_s * u2) / kb
    # geqd = Sum_p (T inv_p) wp_p = (T / rho) * Sum_p (rho inv_p) wp_p:
    # the amp ratio is per-cell, so the thermal equilibria reuse the qf
    # products the energy-loss term needs anyway (1 mul/plane instead of
    # 3 mul + 2 add). Dead cells have T = 0, so the guarded ratio is 0.
    ratio_q = (T_s * recip(jnp.where(rho_s == 0.0, _c(1.0, rho_s),
                                 rho_s))) * (1.0 / _Q)

    g_dirs = []
    for i in range(_Q):
        qf = [_Q * (amp_f[p] * wp[p][i]) for p in range(3)]  # Q feq_p/tau_p
        geqd = ratio_q * (qf[0] + qf[1] + qf[2])
        tm = -1.5
        for p in active:
            tm = tm + cs[p] * recip(qf[p] + offs[p])
        g_dirs.append(g_s[i] * keep + geqd + dT_amp * tm)
    return g_dirs


def collide_species_dirs_fused_fast(
    s, f_s, g_s, mac, Ex, Ey, *,
    taus, q_e, q_i, m_e, m_i, cs2, kb, recip,
    pair_polys=None, self_wpolys=None, neutral_ref=0.0,
):
    """One-loop f+g update sharing the amp*wp equilibrium products.

    The f-side BGK sum and the g-side qf terms both need the products
    prod_p = (rho inv_p) * wp_p,i per direction; computing the direction
    loop once hands the g side the f side's products for free (6 fewer
    plane-muls per species-direction — Mosaic does not CSE across the two
    separate loops). The 9x of qf = 9 prod is refolded:
        recip(9 prod + offs) = (1/9) recip(prod + offs/9)
    with the 1/9 absorbed into the per-cell C_p and ratio_q amplitudes, so
    the per-direction op count drops while the algebra stays the
    partial-fraction form. bf16-mode only (the rounding differs from the
    two-loop form in last bits, inside the approx-reciprocal tolerance);
    the native path keeps the original functions.

    Not used for the delta-form neutral f side (its products use the
    DEVIATION polynomials, nothing to share) — callers route s == 2 with
    neutral_ref != 0 through the classic pair of calls.
    """
    charge = (q_e, q_i, 0.0)
    mass = (m_e, m_i, 1.0)
    t_self, invs, wp, keep = _species_setup(s, mac, cs2, taus, pair_polys,
                                            self_wpolys)
    rho_s, ux_s, uy_s, T_s = mac.rho[s], mac.ux[s], mac.uy[s], mac.T[s]
    amp_f = tuple(rho_s * inv for inv in invs)

    charged = charge[s] != 0.0
    if charged:
        uE = ux_s * Ex + uy_s * Ey
        force_amp = (charge[s] / mass[s] / cs2) * rho_s * (
            1.0 - 1.0 / (2.0 * t_self))

    # g-side per-cell amplitudes with the 1/9 refold
    active = [p for p in range(3) if (1.0 - invs[p]) != 0.0]
    cs9, offs9 = {}, {}
    for p in active:
        r = 1.0 - invs[p]
        cs9[p] = rho_s * ((r * r - r) * (1.0 / _Q)) + r * (1.0 / _Q)
        offs9[p] = 2.0 * r / _Q
    u2 = ux_s * ux_s + uy_s * uy_s
    dT_amp = -(rho_s * u2) / kb
    # geqd = (T/rho) Sum_p 9 prod_p -> the 9 rides in ratio (cf. fast path)
    ratio = T_s * recip(jnp.where(rho_s == 0.0, _c(1.0, rho_s), rho_s))

    f_dirs, g_dirs = [], []
    for i in range(_Q):
        prod = [amp_f[p] * wp[p][i] for p in range(3)]
        feqd = prod[0] + prod[1] + prod[2]
        relax = f_s[i] * keep + feqd
        if charged:
            cE = _CX[i] * Ex + _CY[i] * Ey
            cu = _CX[i] * ux_s + _CY[i] * uy_s
            F = (_W[i] * force_amp) * (cE + cu * cE / cs2 - uE)
            f_dirs.append(relax + F)
        else:
            f_dirs.append(relax)
        geqd = ratio * feqd
        tm = -1.5
        for p in active:
            tm = tm + cs9[p] * recip(prod[p] + offs9[p])
        g_dirs.append(g_s[i] * keep + geqd + dT_amp * tm)
    return f_dirs, g_dirs


def collide_species_dirs(
    s: int,
    f_s,              # indexable: f_s[i] -> (NY, NX) direction i
    g_s,
    mac: Macros,
    Ex: jnp.ndarray,
    Ey: jnp.ndarray,
    *,
    taus,
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    pair_polys=None,  # optional precomputed equilibrium_wpolys per pair axis
    neutral_ref: float = 0.0,
    g_recip=None,     # not None: fast thermal path with this reciprocal
):
    """Post-collision populations for species s as two lists of Q arrays.

    Shared by the XLA path (which stacks the lists) and the Pallas kernels
    (which write each direction straight into the output ref, keeping the
    VMEM live-set to one species at a time). Pass `pair_polys` (the three
    mixture-velocity w-polynomial sets) to share them across species — each
    pair set is used by two species.
    """
    if pair_polys is None:
        p1, p2 = _PAIR_IDX[s]
        pair_polys = {
            p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p], cs2)
            for p in (p1, p2)
        }
    self_wpolys = equilibrium_wpolys(mac.ux[s], mac.uy[s], cs2)
    if g_recip is not None and not (s == 2 and neutral_ref != 0.0):
        return collide_species_dirs_fused_fast(
            s, f_s, g_s, mac, Ex, Ey, taus=taus, q_e=q_e, q_i=q_i,
            m_e=m_e, m_i=m_i, cs2=cs2, kb=kb, recip=g_recip,
            pair_polys=pair_polys, self_wpolys=self_wpolys,
            neutral_ref=neutral_ref)
    f_dirs = collide_species_f_dirs(
        s, f_s, mac, Ex, Ey, taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
        cs2=cs2, pair_polys=pair_polys, self_wpolys=self_wpolys,
        neutral_ref=neutral_ref)
    if g_recip is not None:
        g_dirs = collide_species_g_dirs_fast(
            s, g_s, mac, taus=taus, cs2=cs2, kb=kb, recip=g_recip,
            pair_polys=pair_polys, self_wpolys=self_wpolys)
    else:
        g_dirs = collide_species_g_dirs(
            s, g_s, mac, taus=taus, cs2=cs2, kb=kb, pair_polys=pair_polys,
            self_wpolys=self_wpolys)
    return f_dirs, g_dirs


def collide(
    f: jnp.ndarray,   # (3, Q, NY, NX)
    g: jnp.ndarray,   # (3, Q, NY, NX)
    mac: Macros,
    Ex: jnp.ndarray,  # (NY, NX)
    Ey: jnp.ndarray,
    *,
    taus: Tuple[float, float, float, float, float, float],
    q_e: float,
    q_i: float,
    m_e: float,
    m_i: float,
    cs2: float,
    kb: float,
    neutral_ref: float = 0.0,
    g_recip=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One collision step; returns (f_post, g_post) (pre-streaming)."""
    kw = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i, cs2=cs2, kb=kb,
              neutral_ref=neutral_ref, g_recip=g_recip)
    pair_polys = {
        p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p], cs2)
        for p in range(3)
    }
    f_out, g_out = [], []
    for s in range(3):
        f_dirs, g_dirs = collide_species_dirs(s, f[s], g[s], mac, Ex, Ey,
                                              pair_polys=pair_polys, **kw)
        f_out.append(jnp.stack(f_dirs))
        g_out.append(jnp.stack(g_dirs))
    return jnp.stack(f_out), jnp.stack(g_out)
