"""Fully-fused collide+stream Pallas kernel (periodic BC).

One pass over HBM per step for the entire LBM pipeline except the Poisson
solve: each grid step loads a full-width row band of the populations into
VMEM, computes moments -> 18 equilibria -> triple-BGK + Guo forcing + DDF
thermal (shared ops from lbm_tpu.ops), then performs the *streaming* on the
way out:

  * x-shift: columns are periodic within a full-width band, so the shift is
    an in-VMEM roll (no HBM traffic);
  * y-shift: the band's rows land shifted by c_y in the output array via
    manual async DMAs — a bulk (ty-1)-row copy plus a single wrapped row.

Output DMAs are double-buffered across grid steps (two scratch slots with
deferred waits) so post-stream writeback overlaps the next band's compute.
HBM traffic per step: read f+g once, write f+g once — the reference
traverses its 51 arrays ~10x per step (SURVEY.md section 6 footnote).

This is the BASELINE.json north-star kernel: "BGK relaxation + electric
force + streaming in one pass, no intermediate lattice copy".
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import D2Q9
from ..ops.collide import collide_species_dirs
from ..ops.equilibrium import equilibrium_polys
from ..ops.macros import update_macro

_CX = [int(c) for c in D2Q9.CX]
_CY = [int(c) for c in D2Q9.CY]
_Q = D2Q9.Q
_S = 3


def _roll_x(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Periodic column shift (push: new[x] = old[x - shift])."""
    if shift == 0:
        return a
    return jnp.concatenate((a[:, -shift:], a[:, :-shift]), axis=1)


def _plane_copies(scratch, dst, slot, set_idx, i, base, sems, ty, NY):
    """The 1-2 async copies that place direction i's band, row-shifted by
    c_y, into the output array. Returns a list of copy descriptors."""
    cy = _CY[i]
    if cy == 0:
        return [pltpu.make_async_copy(
            scratch.at[slot, i],
            dst.at[:, i, pl.ds(base, ty), :],
            sems.at[slot, set_idx, i, 0])]
    if cy == 1:
        # scratch rows [0, ty-1) -> dest [base+1, base+ty);
        # scratch row ty-1 -> dest (base+ty) mod NY
        wrap_row = jax.lax.rem(base + ty, jnp.int32(NY))
        return [
            pltpu.make_async_copy(
                scratch.at[slot, i, :, pl.ds(0, ty - 1)],
                dst.at[:, i, pl.ds(base + 1, ty - 1), :],
                sems.at[slot, set_idx, i, 0]),
            pltpu.make_async_copy(
                scratch.at[slot, i, :, pl.ds(ty - 1, 1)],
                dst.at[:, i, pl.ds(wrap_row, 1), :],
                sems.at[slot, set_idx, i, 1]),
        ]
    # cy == -1: scratch rows [1, ty) -> dest [base, base+ty-1);
    # scratch row 0 -> dest (base-1) mod NY
    wrap_row = jax.lax.rem(base - 1 + NY, jnp.int32(NY))
    return [
        pltpu.make_async_copy(
            scratch.at[slot, i, :, pl.ds(1, ty - 1)],
            dst.at[:, i, pl.ds(base, ty - 1), :],
            sems.at[slot, set_idx, i, 0]),
        pltpu.make_async_copy(
            scratch.at[slot, i, :, pl.ds(0, 1)],
            dst.at[:, i, pl.ds(wrap_row, 1), :],
            sems.at[slot, set_idx, i, 1]),
    ]


def _all_copies(fout, gout, fny, gny, slot, base, sems, ty, NY):
    copies = []
    for set_idx, (scr, dst) in enumerate(((fout, fny), (gout, gny))):
        for i in range(_Q):
            copies += _plane_copies(scr, dst, slot, set_idx, i, base,
                                    sems, ty, NY)
    return copies


def _kernel(f_ref, g_ref, ex_ref, ey_ref,      # VMEM input blocks
            fny_ref, gny_ref,                  # ANY (HBM) full outputs
            rq_ref,                            # VMEM output block
            fout, gout, sems,                  # scratch
            *, params, ty, NY):
    k = pl.program_id(0)
    nk = pl.num_programs(0)
    slot = jax.lax.rem(k, jnp.int32(2))
    base = k * ty

    # before overwriting this slot's scratch, drain the DMAs started two
    # grid steps ago (they used base (k-2)*ty)
    @pl.when(k >= 2)
    def _():
        for c in _all_copies(fout, gout, fny_ref, gny_ref, slot,
                             (k - 2) * ty, sems, ty, NY):
            c.wait()

    Ex = ex_ref[:]
    Ey = ey_ref[:]
    f = f_ref[:]
    g = g_ref[:]
    mac = update_macro(f, g, Ex, Ey,
                       q_e=params["q_e"], q_i=params["q_i"],
                       m_e=params["m_e"], m_i=params["m_i"])
    rq_ref[:] = mac.rho_q
    pair_polys = {
        p: equilibrium_polys(mac.ux_pair[p], mac.uy_pair[p], params["cs2"])
        for p in range(3)
    }
    for s in range(_S):
        f_dirs, g_dirs = collide_species_dirs(
            s, f[s], g[s], mac, Ex, Ey,
            taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
            m_e=params["m_e"], m_i=params["m_i"],
            cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys)
        for i in range(_Q):
            fout[slot, i, s] = _roll_x(f_dirs[i], _CX[i])
            gout[slot, i, s] = _roll_x(g_dirs[i], _CX[i])

    for c in _all_copies(fout, gout, fny_ref, gny_ref, slot, base,
                         sems, ty, NY):
        c.start()

    # drain everything still in flight at the last grid step
    @pl.when(k == nk - 1)
    def _():
        for c in _all_copies(fout, gout, fny_ref, gny_ref, slot, base,
                             sems, ty, NY):
            c.wait()

    @pl.when(jnp.logical_and(k == nk - 1, nk > 1))
    def _():
        other = jax.lax.rem(k + 1, jnp.int32(2))
        for c in _all_copies(fout, gout, fny_ref, gny_ref, other,
                             (k - 1) * ty, sems, ty, NY):
            c.wait()


def _pick_band(NY: int, NX: int, itemsize: int) -> int:
    """Tallest band whose working set fits comfortably in VMEM (~9 MB)."""
    for ty in (32, 16, 8, 4, 2):
        if NY % ty:
            continue
        # in blocks (x2 pipeline) + out scratch (2 slots) + ~40 live temps
        bytes_needed = (2 * 2 + 2 * 2) * _S * _Q * ty * NX * itemsize \
            + 40 * ty * NX * itemsize
        if bytes_needed < 9 * 1024 * 1024:
            return ty
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "band"),
)
def collide_stream(
    f: jnp.ndarray,   # (3, Q, NY, NX)
    g: jnp.ndarray,
    Ex: jnp.ndarray,  # (NY, NX)
    Ey: jnp.ndarray,
    *,
    taus: Tuple[float, ...],
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    band: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f_streamed, g_streamed, rho_q) in one fused pass. Periodic BC."""
    S, Q, NY, NX = f.shape
    ty = band or _pick_band(NY, NX, f.dtype.itemsize)
    grid = (NY // ty,)

    pop_spec = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, k, 0),
                            memory_space=pltpu.VMEM)
    field_spec = pl.BlockSpec((ty, NX), lambda k: (k, 0),
                              memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb)
    kernel = functools.partial(_kernel, params=params, ty=ty, NY=NY)

    bytes_pop = S * Q * NY * NX * f.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_spec, pop_spec, field_spec, field_spec],
        out_specs=(any_spec, any_spec, field_spec),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, f.dtype),
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Q, S, ty, NX), f.dtype),
            pltpu.VMEM((2, Q, S, ty, NX), g.dtype),
            pltpu.SemaphoreType.DMA((2, 2, Q, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(3000 * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(f, g, Ex, Ey)
