"""Streaming (advection) step and boundary conditions.

The plasma reference streams *push*-style (temp[x+c] = f[x]) with either
periodic wrap or wall bounce-back (reference: src/streaming.cpp:35-112); the
cavity predecessor streams *pull*-style with three bounce-back walls and a
Zou/He-style moving lid on the top row (old codes/LBM_classic/LBM.cpp:105-159).
Both are reproduced here.

On TPU, periodic streaming is 9 shifted copies (jnp.roll -> XLA dynamic-slice
fusion; under sharding the wrap becomes a collective-permute over ICI).
Bounce-back is a fixed permutation of the (Q, NY, NX) lattice; it is applied
as periodic rolls plus static edge-row fixups (no gather/scatter in the hot
path). A flat-gather oracle built directly from the reference's 4-case write
logic is kept for testing.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..constants import D2Q9

CX = D2Q9.CX
CY = D2Q9.CY
OPP = D2Q9.OPP
Q = D2Q9.Q


def stream_periodic(f: jnp.ndarray) -> jnp.ndarray:
    """Push-periodic streaming of (..., Q, NY, NX) populations.

    temp[y+cy, x+cx, i] = f[y, x, i]  with wraparound
    (reference: src/streaming.cpp:35-59).
    """
    parts = [
        jnp.roll(f[..., i, :, :], shift=(int(CY[i]), int(CX[i])), axis=(-2, -1))
        for i in range(Q)
    ]
    return jnp.stack(parts, axis=-3)


# ---------------------------------------------------------------------------
# Bounce-back walls on all four domain edges (plasma BounceBack mode)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bounceback_gather_map(NX: int, NY: int):
    """Flat gather indices implementing the reference's push bounce-back.

    Builds the destination map exactly as src/streaming.cpp:70-105 (interior
    push; x-in/y-out -> (x+cx, y, opp); x-out/y-in -> (x, y+cy, opp); both
    out -> (x, y, opp)). The map is NOT a permutation: at each domain corner
    one inward diagonal slot is written three times and two slots are never
    written. The reference's loop is a bare `omp for` with no enclosing
    parallel region — it runs serially in (x, y, i) order — so duplicate
    writes resolve deterministically to the LAST source in that order, and
    unwritten slots retain the stale contents of the destination buffer
    (pre-collision f for the f-streaming call, post-collision f for the
    g-streaming call, by the reference's temp-buffer swap chain). Both
    behaviors are replicated bit-for-bit.

    Returns (src, hole): flat source index per destination (holes map to
    themselves) and a boolean hole mask. Flat convention: (i*NY + y)*NX + x.
    """
    size = Q * NY * NX
    src = np.full(size, -1, dtype=np.int64)

    def flat(i, y, x):
        return (i * NY + y) * NX + x

    # serial write order of the reference: x outer, then y, then i;
    # later writes overwrite earlier ones.
    for x in range(NX):
        for y in range(NY):
            for i in range(Q):
                dx, dy = int(CX[i]), int(CY[i])
                o = int(OPP[i])
                xs, ys = x + dx, y + dy
                x_in = 0 <= xs < NX
                y_in = 0 <= ys < NY
                if x_in and y_in:
                    d = flat(i, ys, xs)
                elif x_in:            # y blocked: slide in x, reflect
                    d = flat(o, y, xs)
                elif y_in:            # x blocked: slide in y, reflect
                    d = flat(o, ys, x)
                else:                 # corner: reflect in place
                    d = flat(o, y, x)
                src[d] = flat(i, y, x)

    hole = src < 0
    src = np.where(hole, np.arange(size), src)
    return src, hole


def stream_bounceback(f: jnp.ndarray, stale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Push streaming with bounce-back walls on all four edges.

    f: (..., Q, NY, NX). `stale` supplies the values retained at the corner
    hole slots (the reference's recycled temp buffer — see
    _bounceback_gather_map); defaults to f itself. The same operator applies
    to the thermal populations g — there bounce-back is a zero-flux Neumann
    condition (reference: include/streaming.hpp:55).
    """
    NY, NX = f.shape[-2], f.shape[-1]
    src_np, hole_np = _bounceback_gather_map(NX, NY)
    src = jnp.asarray(src_np)
    hole = jnp.asarray(hole_np)
    lead = f.shape[:-3]
    flat = f.reshape(lead + (Q * NY * NX,))
    out = jnp.take(flat, src, axis=-1)
    if stale is None:
        stale_flat = flat
    else:
        stale_flat = stale.reshape(lead + (Q * NY * NX,))
    out = jnp.where(hole, stale_flat, out)
    return out.reshape(f.shape)


# ---------------------------------------------------------------------------
# Cavity: pull streaming + 3 bounce-back walls + moving lid (top row)
# ---------------------------------------------------------------------------

def stream_cavity(f: jnp.ndarray, u_lid_dyn: jnp.ndarray | float) -> jnp.ndarray:
    """Pull streaming with the lid-driven-cavity boundary handling.

    Replicates old codes/LBM_classic/LBM.cpp:105-159:
      * interior: f_new[y, x, i] = f[y-cy, x-cx, i]
      * left/right walls: reflect (1<-3, 8<-6, 5<-7) / (3<-1, 7<-5, 6<-8)
      * bottom wall: (2<-4, 5<-7, 6<-8)
      * top (moving lid): f_new[4] = f[2]; f_new[7] = f[5] + d5;
        f_new[8] = f[6] + d6 with d_k = -6 w_k rho_local (cx_k * u_lid_dyn)
        evaluated from the pre-streaming populations on the top row.
      * write order matters at corners: sides, then bottom, then top (the
        reference's separate omp-for loops run in that order) — the lid rows
        win the top corners.

    f: (Q, NY, NX); index y is the second axis (y=0 bottom, y=NY-1 top/lid).
    """
    dtype = f.dtype
    w = D2Q9.W

    # interior pull: inverse shift of push => roll by +c (f[y-cy, x-cx])
    fn = jnp.stack(
        [
            jnp.roll(f[i], shift=(int(CY[i]), int(CX[i])), axis=(0, 1))
            for i in range(Q)
        ]
    )

    # left wall x=0: incoming +x directions reflect from their opposites
    fn = fn.at[1, :, 0].set(f[3, :, 0])
    fn = fn.at[8, :, 0].set(f[6, :, 0])
    fn = fn.at[5, :, 0].set(f[7, :, 0])
    # right wall x=NX-1
    fn = fn.at[3, :, -1].set(f[1, :, -1])
    fn = fn.at[7, :, -1].set(f[5, :, -1])
    fn = fn.at[6, :, -1].set(f[8, :, -1])
    # bottom wall y=0
    fn = fn.at[2, 0, :].set(f[4, 0, :])
    fn = fn.at[5, 0, :].set(f[7, 0, :])
    fn = fn.at[6, 0, :].set(f[8, 0, :])

    # top moving lid y=NY-1 (written last: wins the two top corners)
    rho_top = jnp.sum(f[:, -1, :], axis=0)
    u = jnp.asarray(u_lid_dyn, dtype)
    d5 = -6.0 * w[5] * rho_top * (float(CX[5]) * u)
    d6 = -6.0 * w[6] * rho_top * (float(CX[6]) * u)
    fn = fn.at[4, -1, :].set(f[2, -1, :])          # d2 = 0 since cx[2] = 0
    fn = fn.at[7, -1, :].set(f[5, -1, :] + d5)
    fn = fn.at[8, -1, :].set(f[6, -1, :] + d6)
    return fn
