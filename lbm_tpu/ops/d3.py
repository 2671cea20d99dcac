"""Shared D3Q19 physics operators (3-D analog of macros.py/collide.py).

The same pairwise-BGK + Guo-forcing + DDF-thermal structure as the 2-D
reference (src/collisions.cpp), extended to three dimensions on the D3Q19
stencil. Written the TPU way, like the 2-D ops:

  * direction loops unrolled with SCALAR stencil constants (no captured
    array constants — a Pallas kernel requirement, and it keeps every
    per-direction intermediate a (NZ, NY, NX)-shaped register value
    instead of a materialized (19, NZ, NY, NX) field);
  * the amp-independent w_i * poly_i(u) factors are shared across the six
    equilibrium uses per species (f/g x self/pair1/pair2) and across the
    two species of each pair — 6 distinct poly sets for 36 equilibria;
  * the three thermal energy-loss fractions are combined over a common
    denominator (one division per direction).

Shared verbatim by the jnp path (models/plasma3d.py) and the 3-D Pallas
kernel. Species axis order: 0=electron, 1=ion, 2=neutral; pair axis order:
0=(e,i), 1=(e,n), 2=(i,n).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import D3Q19
from .macros import _c

_W = [float(w) for w in D3Q19.W]
_CX = [float(c) for c in D3Q19.CX]
_CY = [float(c) for c in D3Q19.CY]
_CZ = [float(c) for c in D3Q19.CZ]
_Q = D3Q19.Q

_PAIR_IDX = ((0, 1), (0, 2), (1, 2))


def equilibrium_wpolys3(ux, uy, uz, cs2: float):
    """w_i * poly_i(u) for the D3Q19 stencil (cf. 2-D equilibrium.py)."""
    inv = 1.0 / cs2
    u2_term = (ux * ux + uy * uy + uz * uz) * (0.5 * inv)
    out = []
    for i in range(_Q):
        cu = _CX[i] * ux + _CY[i] * uy + _CZ[i] * uz
        out.append(_W[i] * (1.0 + cu * inv + (cu * cu) * (0.5 * inv * inv)
                            - u2_term))
    return out


def equilibrium_wpolys3_dev(ux, uy, uz, cs2: float):
    """w_i * (poly_i - 1) — deviation polynomials for the neutral
    delta-storage mode, built from the velocity terms directly (never as
    wpoly - w, which would cancel catastrophically at the tiny neutral
    velocities the mode exists to rescue; cf. 2-D equilibrium.py)."""
    inv = 1.0 / cs2
    u2_term = (ux * ux + uy * uy + uz * uz) * (0.5 * inv)
    out = []
    for i in range(_Q):
        cu = _CX[i] * ux + _CY[i] * uy + _CZ[i] * uz
        out.append(_W[i] * (cu * inv + (cu * cu) * (0.5 * inv * inv)
                            - u2_term))
    return out


class Macros3D(NamedTuple):
    rho: jnp.ndarray       # (3, NZ, NY, NX) guarded
    ux: jnp.ndarray
    uy: jnp.ndarray
    uz: jnp.ndarray
    T: jnp.ndarray
    ux_pair: jnp.ndarray   # (3, NZ, NY, NX) — (ei, en, in)
    uy_pair: jnp.ndarray
    uz_pair: jnp.ndarray
    rho_q: jnp.ndarray     # (NZ, NY, NX)
    rho_raw: jnp.ndarray = None
    # neutral density deviation when f[2] is delta-stored (cf. 2-D Macros)
    drho_n: jnp.ndarray = None


def _sum_dirs(a_s):
    acc = a_s[0]
    for i in range(1, _Q):
        acc = acc + a_s[i]
    return acc


def _moments3(f_s):
    """rho, px, py, pz for one species (sequential direction order)."""
    rho = _sum_dirs(f_s)
    px = py = pz = None

    def acc(m, c, v):
        if c == 0.0:
            return m
        term = v if c > 0 else -v
        return term if m is None else m + term

    for i in range(_Q):
        px = acc(px, _CX[i], f_s[i])
        py = acc(py, _CY[i], f_s[i])
        pz = acc(pz, _CZ[i], f_s[i])
    return rho, px, py, pz


def update_macro3(
    f, g, Ex, Ey, Ez, *,
    q_e: float, q_i: float, m_e: float, m_i: float,
    neutral_ref: float = 0.0,
) -> Macros3D:
    """Moments + guards + half-force + mixtures + rho_q (the 2-D
    update_macro's semantics on the D3Q19 stencil; same guard thresholds,
    macros.py:88-138). neutral_ref != 0 enables the neutral delta-storage
    mode: f[2] holds deviations from the uniform background
    neutral_ref * w_i (cf. 2-D update_macro)."""
    qom = (q_e / m_e, q_i / m_i, 0.0)
    rho_raw, rho_l, ux_l, uy_l, uz_l, T_l, alive_l = ([] for _ in range(7))
    drho_n = None
    for s in range(3):
        rho, px, py, pz = _moments3(f[s])
        if s == 2 and neutral_ref != 0.0:
            drho_n = rho
            rho = neutral_ref + rho
        alive = rho >= 1e-10
        inv_rho = 1.0 / jnp.where(alive, rho, _c(1.0, rho))
        ux = jnp.where((px == rho) | (px == -rho), _c(0.0, rho), px * inv_rho)
        uy = jnp.where((py == rho) | (py == -rho), _c(0.0, rho), py * inv_rho)
        uz = jnp.where((pz == rho) | (pz == -rho), _c(0.0, rho), pz * inv_rho)
        if qom[s] != 0.0:
            ux = ux + (0.5 * qom[s]) * Ex
            uy = uy + (0.5 * qom[s]) * Ey
            uz = uz + (0.5 * qom[s]) * Ez
        rho_raw.append(rho)
        alive_l.append(alive)
        rho_l.append(jnp.where(alive, rho, _c(0.0, rho)))
        ux_l.append(jnp.where(alive, ux, _c(0.0, rho)))
        uy_l.append(jnp.where(alive, uy, _c(0.0, rho)))
        uz_l.append(jnp.where(alive, uz, _c(0.0, rho)))
        if g is not None:
            T_l.append(jnp.where(alive, _sum_dirs(g[s]), _c(0.0, rho)))

    uxp, uyp, uzp = [], [], []
    for a, b in _PAIR_IDX:
        ra, rb = rho_raw[a], rho_raw[b]
        both_dead = (~alive_l[a]) & (~alive_l[b])
        inv = 1.0 / jnp.where(both_dead, _c(1.0, ra), ra + rb)
        uxp.append(jnp.where(both_dead, _c(0.0, ra),
                             (ra * ux_l[a] + rb * ux_l[b]) * inv))
        uyp.append(jnp.where(both_dead, _c(0.0, ra),
                             (ra * uy_l[a] + rb * uy_l[b]) * inv))
        uzp.append(jnp.where(both_dead, _c(0.0, ra),
                             (ra * uz_l[a] + rb * uz_l[b]) * inv))

    rho_q = (q_i / m_i) * rho_l[1] + (q_e / m_e) * rho_l[0]
    rho_q = jnp.where(rho_q < 1e-15, _c(0.0, rho_q), rho_q)

    return Macros3D(
        rho=jnp.stack(rho_l), ux=jnp.stack(ux_l), uy=jnp.stack(uy_l),
        uz=jnp.stack(uz_l),
        T=jnp.stack(T_l) if g is not None else None,
        ux_pair=jnp.stack(uxp), uy_pair=jnp.stack(uyp), uz_pair=jnp.stack(uzp),
        rho_q=rho_q, rho_raw=jnp.stack(rho_raw), drho_n=drho_n,
    )


def _species_setup3(s, mac, cs2, taus, pair_polys, self_wpolys=None):
    """Shared per-species precomputation (cf. 2-D _species_setup)."""
    tau_e, tau_i, tau_n, tau_ei, tau_en, tau_in = taus
    tau_self = (tau_e, tau_i, tau_n)
    tau_cross = ((tau_ei, tau_en), (tau_ei, tau_in), (tau_en, tau_in))
    p1, p2 = _PAIR_IDX[s]
    t_self = tau_self[s]
    t_c1, t_c2 = tau_cross[s]
    invs = (1.0 / t_self, 1.0 / t_c1, 1.0 / t_c2)
    keep = 1.0 - (invs[0] + invs[1] + invs[2])
    if pair_polys is None:
        pair_polys = {
            p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                                   mac.uz_pair[p], cs2)
            for p in (p1, p2)
        }
    wpoly_self = (self_wpolys if self_wpolys is not None
                  else equilibrium_wpolys3(mac.ux[s], mac.uy[s], mac.uz[s],
                                           cs2))
    wp = (wpoly_self, pair_polys[p1], pair_polys[p2])
    return t_self, invs, wp, keep


def collide_species_f_dirs3(
    s, f_s, mac, Ex, Ey, Ez, *,
    taus, q_e, q_i, m_e, m_i, cs2,
    pair_polys=None, self_wpolys=None, neutral_ref=0.0,
):
    """Mass-population update for species s (never reads g/T); the 3-D
    analog of 2-D collide_species_f_dirs, incl. the exact delta-form BGK
    for delta-stored neutrals."""
    charge = (q_e, q_i, 0.0)
    mass = (m_e, m_i, 1.0)
    t_self, invs, wp, keep = _species_setup3(s, mac, cs2, taus, pair_polys,
                                             self_wpolys)
    p1, p2 = _PAIR_IDX[s]
    rho_s = mac.rho[s]
    ux_s, uy_s, uz_s = mac.ux[s], mac.uy[s], mac.uz[s]
    amp_f = tuple(rho_s * inv for inv in invs)

    if s == 2 and neutral_ref != 0.0:
        # exact delta-form relaxation (cf. 2-D collide_species_f_dirs):
        # delta'_i = keep delta_i + Sum_p amp_p wdev_p,i + damp w_i
        wdev = (equilibrium_wpolys3_dev(ux_s, uy_s, uz_s, cs2),
                equilibrium_wpolys3_dev(mac.ux_pair[p1], mac.uy_pair[p1],
                                        mac.uz_pair[p1], cs2),
                equilibrium_wpolys3_dev(mac.ux_pair[p2], mac.uy_pair[p2],
                                        mac.uz_pair[p2], cs2))
        damp = mac.drho_n * (1.0 - keep)
        return [f_s[i] * keep
                + amp_f[0] * wdev[0][i] + amp_f[1] * wdev[1][i]
                + amp_f[2] * wdev[2][i] + damp * _W[i]
                for i in range(_Q)]

    charged = charge[s] != 0.0
    if charged:
        uE = ux_s * Ex + uy_s * Ey + uz_s * Ez
        force_amp = (charge[s] / mass[s] / cs2) * rho_s * (
            1.0 - 1.0 / (2.0 * t_self))

    f_dirs = []
    for i in range(_Q):
        feqd = (amp_f[0] * wp[0][i] + amp_f[1] * wp[1][i]
                + amp_f[2] * wp[2][i])
        relax = f_s[i] * keep + feqd
        if charged:
            cE = _CX[i] * Ex + _CY[i] * Ey + _CZ[i] * Ez
            cu = _CX[i] * ux_s + _CY[i] * uy_s + _CZ[i] * uz_s
            F = (_W[i] * force_amp) * (cE + cu * cE / cs2 - uE)
            f_dirs.append(relax + F)
        else:
            f_dirs.append(relax)
    return f_dirs


def collide_species_g_dirs3(
    s, g_s, mac, *,
    taus, cs2, kb,
    pair_polys=None, self_wpolys=None, g_recip=None,
):
    """Thermal (DDF) update for species s; needs only macros, not f or E.
    g_recip != None: partial-fraction fast thermal (bf16 mode, cf. 2-D
    collide_species_g_dirs_fast); None: the exact combined-fraction form."""
    t_self, invs, wp, keep = _species_setup3(s, mac, cs2, taus, pair_polys,
                                             self_wpolys)
    rho_s, T_s = mac.rho[s], mac.T[s]
    ux_s, uy_s, uz_s = mac.ux[s], mac.uy[s], mac.uz[s]
    amp_f = tuple(rho_s * inv for inv in invs)
    u2 = ux_s * ux_s + uy_s * uy_s + uz_s * uz_s
    dT_amp = -(rho_s * u2) / kb

    if g_recip is not None:
        # pairs with tau = 1 (r = 0) contribute C_p = 0, an exact -1/2:
        # skip their reciprocal+fma at trace time (cf. the 2-D fast path;
        # tau_n = 1 at the golden taus). Bitwise-identical for alive cells.
        active = [p for p in range(3) if (1.0 - invs[p]) != 0.0]
        cs_l, offs = {}, {}
        for p in active:
            r = 1.0 - invs[p]
            cs_l[p] = rho_s * (r * r - r) + r
            offs[p] = 2.0 * r
        ratio_q = (T_s * g_recip(jnp.where(rho_s == 0.0, _c(1.0, rho_s),
                                           rho_s))) * (1.0 / _Q)
        g_dirs = []
        for i in range(_Q):
            qf = [_Q * (amp_f[p] * wp[p][i]) for p in range(3)]
            geqd = ratio_q * (qf[0] + qf[1] + qf[2])
            tm = -1.5
            for p in active:
                tm = tm + cs_l[p] * g_recip(qf[p] + offs[p])
            g_dirs.append(g_s[i] * keep + geqd + dT_amp * tm)
        return g_dirs

    amp_g = tuple(T_s * inv for inv in invs)
    # combined-fraction thermal terms (cf. 2-D collide.py:119-141)
    tt = []
    for inv in invs:
        r = 1.0 - inv
        tt.append(((2.0 * r * r - 2.0 * r) * rho_s, 4.0 * r))
    g_dirs = []
    for i in range(_Q):
        geqd = amp_g[0] * wp[0][i] + amp_g[1] * wp[1][i] + amp_g[2] * wp[2][i]
        ns, ds = [], []
        for p in range(3):
            qf = _Q * (amp_f[p] * wp[p][i])
            ns.append(tt[p][0] - qf)
            ds.append(tt[p][1] + 2.0 * qf)
        d12 = ds[0] * ds[1]
        tm = (ns[0] * (ds[1] * ds[2]) + ns[1] * (ds[0] * ds[2])
              + ns[2] * d12) / (d12 * ds[2])
        g_dirs.append(g_s[i] * keep + geqd + dT_amp * tm)
    return g_dirs


def collide_species_dirs3(
    s: int,
    f_s, g_s,             # indexable: [i] -> (NZ, NY, NX)
    mac: Macros3D,
    Ex, Ey, Ez,
    *,
    taus,
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    pair_polys=None,
    neutral_ref: float = 0.0,
    g_recip=None,
):
    """Post-collision (f_dirs, g_dirs) for species s, as lists of Q arrays
    (the 2-D collide_species_dirs on D3Q19; same factored/packed algebra).

    neutral_ref != 0: exact delta-form BGK for the neutral mass populations
    (cf. 2-D collide_species_f_dirs). g_recip != None: partial-fraction
    thermal term with the supplied reciprocal — the bf16 fast mode
    (cf. 2-D collide_species_g_dirs_fast)."""
    if pair_polys is None:
        p1, p2 = _PAIR_IDX[s]
        pair_polys = {
            p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                                   mac.uz_pair[p], cs2)
            for p in (p1, p2)
        }
    self_wpolys = equilibrium_wpolys3(mac.ux[s], mac.uy[s], mac.uz[s], cs2)
    f_dirs = collide_species_f_dirs3(
        s, f_s, mac, Ex, Ey, Ez, taus=taus, q_e=q_e, q_i=q_i, m_e=m_e,
        m_i=m_i, cs2=cs2, pair_polys=pair_polys, self_wpolys=self_wpolys,
        neutral_ref=neutral_ref)
    g_dirs = collide_species_g_dirs3(
        s, g_s, mac, taus=taus, cs2=cs2, kb=kb, pair_polys=pair_polys,
        self_wpolys=self_wpolys, g_recip=g_recip)
    return f_dirs, g_dirs


def macros_from_pack3(pack, g):
    """Rebuild the Macros3D the thermal (g) side needs from the mass
    kernel's pack: pack = stack([rho_raw(3), ux(3), uy(3), uz(3)]) ->
    (12, ...). Guard masks, guarded densities, T moments and mixture
    velocities are recomputed locally (cheap) instead of shipping more
    planes through HBM (cf. 2-D macros_from_pack). Delta-transparent:
    rho_raw already carries the full neutral density."""
    rho_raw = [pack[s] for s in range(3)]
    ux = [pack[3 + s] for s in range(3)]
    uy = [pack[6 + s] for s in range(3)]
    uz = [pack[9 + s] for s in range(3)]
    alive = [r >= 1e-10 for r in rho_raw]
    rho = [jnp.where(a, r, _c(0.0, r)) for a, r in zip(alive, rho_raw)]
    T = [jnp.where(a, _sum_dirs(g[s]), _c(0.0, rho_raw[s]))
         for s, a in enumerate(alive)]
    uxp, uyp, uzp = [], [], []
    for a, b in _PAIR_IDX:
        ra, rb = rho_raw[a], rho_raw[b]
        both_dead = (~alive[a]) & (~alive[b])
        inv = 1.0 / jnp.where(both_dead, _c(1.0, ra), ra + rb)
        uxp.append(jnp.where(both_dead, _c(0.0, ra),
                             (ra * ux[a] + rb * ux[b]) * inv))
        uyp.append(jnp.where(both_dead, _c(0.0, ra),
                             (ra * uy[a] + rb * uy[b]) * inv))
        uzp.append(jnp.where(both_dead, _c(0.0, ra),
                             (ra * uz[a] + rb * uz[b]) * inv))
    return Macros3D(
        rho=jnp.stack(rho), ux=jnp.stack(ux), uy=jnp.stack(uy),
        uz=jnp.stack(uz), T=jnp.stack(T),
        ux_pair=jnp.stack(uxp), uy_pair=jnp.stack(uyp),
        uz_pair=jnp.stack(uzp),
        rho_q=None, rho_raw=jnp.stack(rho_raw),
    )
