"""Three-population plasma on a D3Q19 lattice (3-D column, stretch config).

Extends the 2-D physics (models/plasma.py) to three dimensions: the same
pairwise-BGK + Guo-forcing + DDF-thermal structure with the D3Q19 stencil,
periodic boundaries, and a 3-D spectral Poisson solve

    phi_hat = rho_hat / (4 (sin^2(pi kx/NX) + sin^2(pi ky/NY)
                             + sin^2(pi kz/NZ)))

with the k=0 mode zeroed — the direct generalization of the reference's
2-D eigenvalue (src/poisson.cpp:388-409). The thermal energy-loss term uses
Q=19 where the 2-D reference hard-codes Q=9.

State layout: (3, 19, NZ, NY, NX). jnp/XLA path (the Pallas treatment of
the 3-D stencil follows the 2-D kernel's band pipeline and is future work).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PlasmaConfig
from ..constants import D3Q19

_Q = D3Q19.Q
_S = 3


class Plasma3DState(NamedTuple):
    f: jnp.ndarray    # (3, 19, NZ, NY, NX)
    g: jnp.ndarray
    Ex: jnp.ndarray   # (NZ, NY, NX)
    Ey: jnp.ndarray
    Ez: jnp.ndarray
    phi: jnp.ndarray
    step: jnp.ndarray


def init_state(cfg: PlasmaConfig) -> Plasma3DState:
    """Electrons/ions seeded in the center column (box in x-y spanning all
    z — a plasma column), neutrals everywhere; uniform external E field."""
    assert cfg.NZ > 0, "3-D config requires NZ > 0"
    u = cfg.units()
    NZ, NY, NX = cfg.NZ, cfg.NY, cfg.NX
    dtype = cfg.dtype
    w = np.asarray(D3Q19.W)[:, None, None, None]

    box = np.zeros((NZ, NY, NX))
    box[:, NY // 4 + 1: (3 * NY) // 4, NX // 4 + 1: (3 * NX) // 4] = 1.0
    ones = np.ones((NZ, NY, NX))

    f = np.stack([w * (u.rho_e_init * box), w * (u.rho_i_init * box),
                  w * (u.rho_n_init * ones)])
    g = np.stack([w * (u.T_e_init * box), w * (u.T_i_init * box),
                  w * (u.T_n_init * ones)])
    zero = jnp.zeros((NZ, NY, NX), dtype)
    return Plasma3DState(
        f=jnp.asarray(f, dtype), g=jnp.asarray(g, dtype),
        Ex=jnp.full((NZ, NY, NX), u.Ex_ext, dtype),
        Ey=jnp.full((NZ, NY, NX), u.Ey_ext, dtype),
        Ez=zero, phi=zero, step=jnp.zeros((), jnp.int32),
    )


def _consts(dtype):
    cx = jnp.asarray(D3Q19.CX.astype(np.float64), dtype)[:, None, None, None]
    cy = jnp.asarray(D3Q19.CY.astype(np.float64), dtype)[:, None, None, None]
    cz = jnp.asarray(D3Q19.CZ.astype(np.float64), dtype)[:, None, None, None]
    w = jnp.asarray(D3Q19.W, dtype)[:, None, None, None]
    return cx, cy, cz, w


def _equilibrium(amp, ux, uy, uz, cs2, dtype):
    cx, cy, cz, w = _consts(dtype)
    u2 = ux * ux + uy * uy + uz * uz
    cu = cx * ux[None] + cy * uy[None] + cz * uz[None]
    inv = 1.0 / cs2
    return w * amp[None] * (1.0 + cu * inv + cu * cu * (0.5 * inv * inv)
                            - u2[None] * (0.5 * inv))


class Macros3D(NamedTuple):
    rho: jnp.ndarray
    ux: jnp.ndarray
    uy: jnp.ndarray
    uz: jnp.ndarray
    T: jnp.ndarray
    u_pair: Tuple  # ((ux,uy,uz) per pair axis)
    rho_q: jnp.ndarray


def update_macro(f, g, Ex, Ey, Ez, *, q_e, q_i, m_e, m_i):
    dtype = f.dtype
    cx, cy, cz, _ = _consts(dtype)
    rho_raw = jnp.sum(f, axis=1)
    px = jnp.sum(f * cx[None], axis=1)
    py = jnp.sum(f * cy[None], axis=1)
    pz = jnp.sum(f * cz[None], axis=1)
    T_raw = jnp.sum(g, axis=1)

    alive = rho_raw >= 1e-10
    safe = jnp.where(alive, rho_raw, 1.0)
    ux = jnp.where((px == rho_raw) | (px == -rho_raw), 0.0, px / safe)
    uy = jnp.where((py == rho_raw) | (py == -rho_raw), 0.0, py / safe)
    uz = jnp.where((pz == rho_raw) | (pz == -rho_raw), 0.0, pz / safe)
    qom = jnp.asarray(np.array([q_e / m_e, q_i / m_i, 0.0]),
                      dtype)[:, None, None, None]
    ux = ux + 0.5 * qom * Ex[None]
    uy = uy + 0.5 * qom * Ey[None]
    uz = uz + 0.5 * qom * Ez[None]

    rho = jnp.where(alive, rho_raw, 0.0)
    ux = jnp.where(alive, ux, 0.0)
    uy = jnp.where(alive, uy, 0.0)
    uz = jnp.where(alive, uz, 0.0)
    T = jnp.where(alive, T_raw, 0.0)

    pairs = []
    for a, b in ((0, 1), (0, 2), (1, 2)):
        ra, rb = rho_raw[a], rho_raw[b]
        dead = (~alive[a]) & (~alive[b])
        den = jnp.where(dead, 1.0, ra + rb)
        pairs.append(tuple(
            jnp.where(dead, 0.0, (ra * ua + rb * ub) / den)
            for ua, ub in ((ux[a], ux[b]), (uy[a], uy[b]), (uz[a], uz[b]))))

    rho_q = (q_i / m_i) * rho[1] + (q_e / m_e) * rho[0]
    rho_q = jnp.where(rho_q < 1e-15, 0.0, rho_q)
    return Macros3D(rho=rho, ux=ux, uy=uy, uz=uz, T=T,
                    u_pair=tuple(pairs), rho_q=rho_q)


_PAIR_IDX = ((0, 1), (0, 2), (1, 2))


def collide(f, g, mac, Ex, Ey, Ez, *, taus, q_e, q_i, m_e, m_i, cs2, kb):
    dtype = f.dtype
    cx, cy, cz, w = _consts(dtype)
    tau_e, tau_i, tau_n, tau_ei, tau_en, tau_in = taus
    tau_self = (tau_e, tau_i, tau_n)
    tau_cross = ((tau_ei, tau_en), (tau_ei, tau_in), (tau_en, tau_in))
    charge = (q_e, q_i, 0.0)
    mass = (m_e, m_i, 1.0)

    def term(rho_s, tau, feq):
        r = 1.0 - 1.0 / tau
        qf = _Q * feq / tau
        return (2.0 * rho_s[None] * r * r - 2.0 * r * rho_s[None] - qf) / (
            2.0 * (2.0 * r + qf))

    f_out, g_out = [], []
    for s in range(_S):
        p1, p2 = _PAIR_IDX[s]
        t_s = tau_self[s]
        t1, t2 = tau_cross[s]
        rho_s = mac.rho[s]
        us = (mac.ux[s], mac.uy[s], mac.uz[s])
        up1, up2 = mac.u_pair[p1], mac.u_pair[p2]

        feq_s = _equilibrium(rho_s, *us, cs2, dtype)
        feq_1 = _equilibrium(rho_s, *up1, cs2, dtype)
        feq_2 = _equilibrium(rho_s, *up2, cs2, dtype)
        geq_s = _equilibrium(mac.T[s], *us, cs2, dtype)
        geq_1 = _equilibrium(mac.T[s], *up1, cs2, dtype)
        geq_2 = _equilibrium(mac.T[s], *up2, cs2, dtype)

        tm = term(rho_s, t_s, feq_s) + term(rho_s, t1, feq_1) \
            + term(rho_s, t2, feq_2)
        u2 = (us[0] ** 2 + us[1] ** 2 + us[2] ** 2)[None]
        dT = -(rho_s[None] * tm * u2) / kb
        C_T = (-(g[s] - geq_s) / t_s - (g[s] - geq_1) / t1
               - (g[s] - geq_2) / t2)
        g_out.append(g[s] + C_T + dT)

        C = (-(f[s] - feq_s) / t_s - (f[s] - feq_1) / t1
             - (f[s] - feq_2) / t2)
        if charge[s] != 0.0:
            cE = cx * Ex[None] + cy * Ey[None] + cz * Ez[None]
            cu = cx * us[0][None] + cy * us[1][None] + cz * us[2][None]
            uE = (us[0] * Ex + us[1] * Ey + us[2] * Ez)[None]
            pref = w * (charge[s] / mass[s] / cs2) * rho_s[None] * (
                1.0 - 1.0 / (2.0 * t_s))
            f_out.append(f[s] + C + pref * (cE + cu * cE / cs2 - uE))
        else:
            f_out.append(f[s] + C)
    return jnp.stack(f_out), jnp.stack(g_out)


def stream_periodic(f):
    parts = [
        jnp.roll(f[..., i, :, :, :],
                 shift=(int(D3Q19.CZ[i]), int(D3Q19.CY[i]), int(D3Q19.CX[i])),
                 axis=(-3, -2, -1))
        for i in range(_Q)
    ]
    return jnp.stack(parts, axis=-4)


def solve_fft3d(rho_q):
    NZ, NY, NX = rho_q.shape
    rho_hat = jnp.fft.rfftn(rho_q)
    kz = np.fft.fftfreq(NZ) * NZ
    ky = np.fft.fftfreq(NY) * NY
    kx = np.arange(NX // 2 + 1)
    den = 4.0 * (np.sin(np.pi * kz / NZ)[:, None, None] ** 2
                 + np.sin(np.pi * ky / NY)[None, :, None] ** 2
                 + np.sin(np.pi * kx / NX)[None, None, :] ** 2)
    inv = np.where(den > 1e-15, 1.0 / np.maximum(den, 1e-300), 0.0)
    phi = jnp.fft.irfftn(rho_hat * jnp.asarray(inv, rho_hat.dtype),
                         s=(NZ, NY, NX))
    return phi.astype(rho_q.dtype)


def efield_periodic3d(phi):
    Ex = -0.5 * (jnp.roll(phi, -1, 2) - jnp.roll(phi, 1, 2))
    Ey = -0.5 * (jnp.roll(phi, -1, 1) - jnp.roll(phi, 1, 1))
    Ez = -0.5 * (jnp.roll(phi, -1, 0) - jnp.roll(phi, 1, 0))
    return Ex, Ey, Ez


def make_step(cfg: PlasmaConfig) -> Callable[[Plasma3DState], Plasma3DState]:
    from ..config import PoissonSolver

    u = cfg.units()
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("3-D model supports FFT/NONE Poisson")

    def step(state: Plasma3DState) -> Plasma3DState:
        mac = update_macro(state.f, state.g, state.Ex, state.Ey, state.Ez,
                           q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i)
        f, g = collide(state.f, state.g, mac, state.Ex, state.Ey, state.Ez,
                       taus=cfg.taus, q_e=u.q_e, q_i=u.q_i,
                       m_e=u.m_e, m_i=u.m_i, cs2=u.cs2, kb=u.kb)
        f = stream_periodic(f)
        g = stream_periodic(g)
        if cfg.poisson == PoissonSolver.FFT:
            phi = solve_fft3d(mac.rho_q)
            Ex, Ey, Ez = efield_periodic3d(phi)
        elif cfg.compat.none_solver_kills_external_field:
            # reference NONE-solver quirk (src/poisson.cpp:34-43)
            z = jnp.zeros_like(state.Ex)
            Ex, Ey, Ez, phi = z, z, z, state.phi
        else:
            Ex, Ey, Ez, phi = state.Ex, state.Ey, state.Ez, state.phi
        return Plasma3DState(f=f, g=g, Ex=Ex, Ey=Ey, Ez=Ez, phi=phi,
                             step=state.step + 1)

    return step


def make_rollout(cfg: PlasmaConfig, n: Optional[int] = None):
    step = make_step(cfg)
    n_steps = cfg.nsteps if n is None else n

    def rollout(state):
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return rollout
