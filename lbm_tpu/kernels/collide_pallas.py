"""Fused macro+equilibria+collide Pallas kernel.

One VMEM-resident pass computes, per lattice tile: the 12 macroscopic
moments (with the reference's guards), the 3 pairwise mixture velocities,
the charge density, all 18 equilibria, the triple-BGK relaxation, the Guo
forcing term and the DDF thermal source — and writes the post-collision
populations. Nothing intermediate ever touches HBM (the reference
materializes 30 full-lattice arrays per step here; the naive XLA path
materializes several).

The kernel body *reuses the exact jnp ops* from lbm_tpu.ops (macros/collide),
applied to VMEM blocks, so the Pallas path is numerics-identical to the
reference jnp path by construction.

Streaming remains outside (XLA shifted copies); the fully-fused
collide+stream ghost-cell kernel is kernels/fused_step (Plan B).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.collide import collide_species_dirs
from ..ops.equilibrium import equilibrium_wpolys
from ..ops.macros import update_macro

_Q = 9


def _kernel(f_ref, g_ref, ex_ref, ey_ref, fo_ref, go_ref, rq_ref, *, params):
    Ex = ex_ref[:]
    Ey = ey_ref[:]
    f = f_ref[:]
    g = g_ref[:]
    mac = update_macro(f, g, Ex, Ey,
                       q_e=params["q_e"], q_i=params["q_i"],
                       m_e=params["m_e"], m_i=params["m_i"],
                       neutral_ref=params["neutral_ref"])
    rq_ref[:] = mac.rho_q
    # mixture-velocity polynomials are shared between species: compute once
    pair_polys = {
        p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p], params["cs2"])
        for p in range(3)
    }
    # one species at a time, each direction written straight to the output
    # ref — keeps the VMEM live-set small (the stacked-everything form blew
    # the 16 MB scoped-vmem limit)
    for s in range(3):
        f_dirs, g_dirs = collide_species_dirs(
            s, f[s], g[s], mac, Ex, Ey,
            taus=params["taus"],
            q_e=params["q_e"], q_i=params["q_i"],
            m_e=params["m_e"], m_i=params["m_i"],
            cs2=params["cs2"], kb=params["kb"],
            pair_polys=pair_polys, neutral_ref=params["neutral_ref"])
        for i in range(_Q):
            fo_ref[s, i] = f_dirs[i]
            go_ref[s, i] = g_dirs[i]


def _pick_tile(n: int, targets=(128, 64, 32, 16, 8)) -> int:
    for t in targets:
        if n % t == 0:
            return t
    return n


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "neutral_ref"),
)
def fused_collide(
    f: jnp.ndarray,   # (3, Q, NY, NX)
    g: jnp.ndarray,
    Ex: jnp.ndarray,  # (NY, NX)
    Ey: jnp.ndarray,
    *,
    taus: Tuple[float, ...],
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (f_post, g_post, rho_q)."""
    S, Q, NY, NX = f.shape
    ty, tx = _pick_tile(NY, targets=(64, 32, 16, 8)), _pick_tile(NX)
    grid = (NY // ty, NX // tx)

    pop_spec = pl.BlockSpec((S, Q, ty, tx), lambda i, j: (0, 0, i, j),
                            memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((ty, tx), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = functools.partial(_kernel, params=params)

    bytes_pop = S * Q * NY * NX * f.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_spec, pop_spec, field_spec, field_spec],
        out_specs=(pop_spec, pop_spec, field_spec),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, f.dtype),
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2500 * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f, g, Ex, Ey)
