"""Second-order Maxwell-Boltzmann equilibria on the D2Q9 stencil.

    eq_i(amp, u) = w_i * amp * (1 + (c_i.u)/cs2 + (c_i.u)^2/(2 cs2^2)
                                 - |u|^2/(2 cs2))

`amp` is the species density for the mass populations f, or the species
temperature for the thermal (DDF) populations g — the reference uses the
identical polynomial for both (reference: src/plasma.cpp:162-308, which
materializes 18 such fields per step; here they are computed on the fly and
fused by XLA / consumed in-register by the Pallas kernel).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import D2Q9


def equilibrium(
    amp: jnp.ndarray,
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    cs2: float,
    *,
    w: np.ndarray = D2Q9.W,
    cx: np.ndarray = D2Q9.CX,
    cy: np.ndarray = D2Q9.CY,
) -> jnp.ndarray:
    """Equilibrium populations, shape (Q, *amp.shape).

    amp/ux/uy: (..., NY, NX) broadcastable fields.
    """
    dtype = amp.dtype
    inv = 1.0 / cs2
    wq = jnp.asarray(w, dtype)[:, None, None]
    cxq = jnp.asarray(cx.astype(np.float64), dtype)[:, None, None]
    cyq = jnp.asarray(cy.astype(np.float64), dtype)[:, None, None]

    u2 = ux * ux + uy * uy                       # (NY, NX)
    cu = cxq * ux[None] + cyq * uy[None]         # (Q, NY, NX)
    poly = 1.0 + cu * inv + (cu * cu) * (0.5 * inv * inv) - u2[None] * (0.5 * inv)
    return wq * amp[None] * poly
