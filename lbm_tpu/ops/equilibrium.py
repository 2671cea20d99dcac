"""Second-order Maxwell-Boltzmann equilibria on the D2Q9 stencil.

    eq_i(amp, u) = w_i * amp * (1 + (c_i.u)/cs2 + (c_i.u)^2/(2 cs2^2)
                                 - |u|^2/(2 cs2))

`amp` is the species density for the mass populations f, or the species
temperature for the thermal (DDF) populations g — the reference uses the
identical polynomial for both (reference: src/plasma.cpp:162-308, which
materializes 18 such fields per step; here they are computed on the fly and
fused by XLA / consumed in-register by the Pallas kernel).

The direction loop is unrolled with *scalar* stencil constants: no captured
array constants (a Pallas kernel requirement) and the per-direction algebra
the VPU sees is exactly the reference's per-i expression.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..constants import D2Q9

_W = [float(w) for w in D2Q9.W]
_CX = [float(c) for c in D2Q9.CX]
_CY = [float(c) for c in D2Q9.CY]


def equilibrium_polys(
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    cs2: float,
) -> List[jnp.ndarray]:
    """The amp-independent polynomial factor per direction.

    eq_i(amp, u) = w_i * amp * poly_i(u). The polynomial depends only on the
    velocity set, so the 18 equilibria per cell share 6 distinct poly sets
    (3 self + 3 mixture velocities) — computing them once is a pure win and
    bitwise-identical to the unfactored form.
    """
    inv = 1.0 / cs2
    u2_term = (ux * ux + uy * uy) * (0.5 * inv)
    out = []
    for i in range(D2Q9.Q):
        cu = _CX[i] * ux + _CY[i] * uy
        out.append(1.0 + cu * inv + (cu * cu) * (0.5 * inv * inv) - u2_term)
    return out


def equilibrium_from_polys(amp: jnp.ndarray, polys) -> List[jnp.ndarray]:
    """eq_i = w_i * amp * poly_i (same multiply order as the direct form)."""
    return [_W[i] * amp * polys[i] for i in range(D2Q9.Q)]


def equilibrium_wpolys(ux: jnp.ndarray, uy: jnp.ndarray, cs2: float):
    """w_i * poly_i — the weight folded into the shared polynomial so the
    per-amplitude cost is a single multiply (collide uses every equilibrium
    scaled by an amplitude anyway)."""
    polys = equilibrium_polys(ux, uy, cs2)
    return [_W[i] * polys[i] for i in range(D2Q9.Q)]


def equilibrium_wpolys_dev(ux: jnp.ndarray, uy: jnp.ndarray, cs2: float):
    """w_i * (poly_i - 1) — the DEVIATION polynomials, in factored form.

    Used by the neutral delta-storage mode (ops/collide.py): the neutral
    equilibrium relative to the uniform background rho_ref * w_i is
        feq_i - rho_ref w_i = rho (w_i poly_i) - rho_ref w_i
                            = rho * wdev_i + (rho - rho_ref) * w_i,
    and wdev_i MUST be built from the velocity terms directly — computing
    wpoly_i - w_i would cancel catastrophically at the tiny neutral
    velocities that motivate the mode (|u_n| ~ 1e-8 lattice units at the
    golden parameters, SURVEY.md section 7.3.4)."""
    inv = 1.0 / cs2
    u2_term = (ux * ux + uy * uy) * (0.5 * inv)
    out = []
    for i in range(D2Q9.Q):
        cu = _CX[i] * ux + _CY[i] * uy
        out.append(_W[i] * (cu * inv + (cu * cu) * (0.5 * inv * inv)
                            - u2_term))
    return out


def equilibrium_dirs(
    amp: jnp.ndarray,
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    cs2: float,
) -> List[jnp.ndarray]:
    """Per-direction equilibrium populations as a list of Q arrays."""
    return equilibrium_from_polys(amp, equilibrium_polys(ux, uy, cs2))


def equilibrium(
    amp: jnp.ndarray,
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    cs2: float,
) -> jnp.ndarray:
    """Equilibrium populations, shape (Q, *amp.shape)."""
    return jnp.stack(equilibrium_dirs(amp, ux, uy, cs2))
