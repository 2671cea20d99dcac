"""Single-population D2Q9 cavity physics, per-direction form.

The formulas replicate the classic solver (reference:
old codes/LBM_classic/LBM.cpp:43-88): BGK collision against the
second-order equilibrium with the hard-coded 3 / 4.5 / 1.5 coefficients,
and the post-streaming moment update with the rho < 1e-10 guard.

Everything here is written per direction with SCALAR stencil constants and
sequential 0..8 accumulation — the form Pallas kernel bodies require (no
captured array constants) and the reference's own serial reduction order.
The jnp model (models/cavity.py) and the fused kernel
(kernels/fused_cavity.py) both call these functions verbatim, so the two
backends are bitwise-identical by construction.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ..constants import D2Q9

W = [float(w) for w in D2Q9.W]
CX = [int(c) for c in D2Q9.CX]
CY = [int(c) for c in D2Q9.CY]
Q = D2Q9.Q


def feq_dir(i: int, rho, ux, uy, u2):
    """w_i rho (1 + 3 c.u + 4.5 (c.u)^2 - 1.5 u^2)  (LBM.cpp:55).

    Zero-velocity stencil terms are elided; the elision only flips the sign
    of a floating-point zero, which every downstream consumer erases.
    """
    cx, cy = CX[i], CY[i]
    if cx and cy:
        cu = float(cx) * ux + float(cy) * uy
    elif cx:
        cu = float(cx) * ux
    elif cy:
        cu = float(cy) * uy
    else:
        return W[0] * rho * (1.0 - 1.5 * u2)
    return W[i] * rho * (1.0 + 3.0 * cu + 4.5 * cu * cu - 1.5 * u2)


def collide_dirs(f_dirs: Sequence, rho, ux, uy, tau: float) -> List:
    """BGK relaxation of all 9 populations: f - (f - feq)/tau (LBM.cpp:53-57).

    f_dirs: 9 (NY, NX)-shaped planes (array slices or in-kernel values).
    """
    u2 = ux * ux + uy * uy
    return [
        f_dirs[i] - (f_dirs[i] - feq_dir(i, rho, ux, uy, u2)) / tau
        for i in range(Q)
    ]


def sum_dirs(planes: Sequence):
    """Sequential 0..8 accumulation (the reference's reduction order)."""
    acc = planes[0]
    for i in range(1, Q):
        acc = acc + planes[i]
    return acc


def macros_guarded(f_dirs: Sequence) -> Tuple:
    """(rho, ux, uy) with the rho < 1e-10 dead-cell guard (LBM.cpp:74-88).

    Momentum sums skip zero-velocity directions (sign-of-zero neutral);
    nonzero terms accumulate in direction order like the reference's loop.
    """
    rho_raw = sum_dirs(f_dirs)
    px = py = None
    for i in range(Q):
        if CX[i]:
            t = f_dirs[i] if CX[i] > 0 else -f_dirs[i]
            px = t if px is None else px + t
        if CY[i]:
            t = f_dirs[i] if CY[i] > 0 else -f_dirs[i]
            py = t if py is None else py + t
    alive = rho_raw >= 1e-10
    zero = jnp.zeros((), f_dirs[0].dtype)
    one = jnp.ones((), f_dirs[0].dtype)
    safe = jnp.where(alive, rho_raw, one)
    rho = jnp.where(alive, rho_raw, zero)
    ux = jnp.where(alive, px / safe, zero)
    uy = jnp.where(alive, py / safe, zero)
    return rho, ux, uy


def lid_deltas(rho_top, u_lid_dyn) -> Tuple:
    """Zou/He-style momentum corrections on the moving lid (LBM.cpp:146-153).

    rho_top: per-column density of the PRE-streaming (post-collision)
    populations on the lid row. Returns (d5, d6), added to the reflected
    f[5] -> f[7] and f[6] -> f[8] populations.
    """
    d5 = -6.0 * W[5] * rho_top * (float(CX[5]) * u_lid_dyn)
    d6 = -6.0 * W[6] * rho_top * (float(CX[6]) * u_lid_dyn)
    return d5, d6
