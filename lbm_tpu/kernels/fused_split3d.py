"""Wide-cross-section 3-D fused step: mass/thermal kernel pair (D3Q19).

The single 3-D kernel (fused_step3d.py) holds the f AND g z-slice working
sets in VMEM simultaneously, capping the cross-section at ~160² (f32) /
~230² (bf16). Mass collisions never read g, and the thermal side needs
only g plus 12 macro planes, so the step splits into two kernels that
each fit at roughly twice the cross-section area (cf. the 2-D pair in
fused_split.py):

  A (mass):    f, Ex, Ey, Ez -> f_streamed, pack(rho_raw, ux, uy, uz),
               rho_q
  B (thermal): g, pack       -> g_streamed

Both run the same single-z-slice software pipeline as fused_step3d
(collide slice k as values, assemble streamed slice k-1 from scratch
planes, two epilogue steps close the periodic wrap; in-place HBM update
via input/output aliasing). Extra HBM traffic vs the single kernel:
write+read of the 12-plane pack at the FIELD dtype (the pack carries
densities and velocities whose dynamic range must not be storage-rounded
in bf16 mode), ~(2*12*4)/(4*57*itemsize) of the population traffic.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import D3Q19
from ..ops.d3 import (collide_species_f_dirs3, collide_species_g_dirs3,
                      equilibrium_wpolys3, macros_from_pack3, update_macro3)
from .fused_step import _cast_io, _g_recip_for, _store
from .fused_step3d import _roll2

_CX = [int(c) for c in D3Q19.CX]
_CY = [int(c) for c in D3Q19.CY]
_CZ = [int(c) for c in D3Q19.CZ]
_Q = D3Q19.Q
_S = 3

_DIRS_ZPOS = [i for i in range(_Q) if _CZ[i] == 1]
_DIRS_ZNEG = [i for i in range(_Q) if _CZ[i] == -1]


def _assemble3(out_ref, s, prev, zlast, below):
    for i in range(_Q):
        cz = _CZ[i]
        if cz == 0:
            out_ref[s, i, 0] = prev[i, s]
        elif cz == 1:
            out_ref[s, i, 0] = zlast[_DIRS_ZPOS.index(i), s]
        else:
            out_ref[s, i, 0] = below[_DIRS_ZNEG.index(i)]


def _slice_pipeline(compute, out_ref, scratch, k, nk):
    """Shared z-slice march/epilogue for one population set (the single
    3-D kernel's structure, fused_step3d._make_kernel, for f OR g only).

    compute() -> per-species (y, x)-rolled plane lists for slice k.
    scratch = (prev, zlast, b0, b1)."""
    prev, zlast, b0, b1 = scratch

    @pl.when(k < nk)
    def _():
        v = compute()
        for s in range(_S):
            @pl.when(k >= 1)
            def _(s=s):
                below = [v[s][i] for i in _DIRS_ZNEG]
                _assemble3(out_ref, s, prev, zlast, below)

            @pl.when(k == 0)
            def _(s=s):
                for i in range(_Q):
                    b0[i, s] = v[s][i]

            if nk > 1:
                @pl.when(k == 1)
                def _(s=s):
                    for gi, i in enumerate(_DIRS_ZNEG):
                        b1[gi, s] = v[s][i]

            for gi, i in enumerate(_DIRS_ZPOS):
                zlast[gi, s] = prev[i, s]
            for i in range(_Q):
                prev[i, s] = v[s][i]

    @pl.when(k == nk)
    def _():
        for s in range(_S):
            below = [b0[i, s] for i in _DIRS_ZNEG]
            _assemble3(out_ref, s, prev, zlast, below)

    @pl.when(k == nk + 1)
    def _():
        for s in range(_S):
            for i in range(_Q):
                cz = _CZ[i]
                if cz == 0:
                    out_ref[s, i, 0] = b0[i, s]
                elif cz == 1:
                    out_ref[s, i, 0] = prev[i, s]
                else:
                    gi = _DIRS_ZNEG.index(i)
                    if nk == 1:
                        out_ref[s, i, 0] = b0[i, s]
                    else:
                        out_ref[s, i, 0] = b1[gi, s]


def _specs3(S, Q, NY, NX, nk, fld_dtype_planes=12):
    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk + 1, jnp.int32(0),
                         jnp.where(k == nk, jnp.int32(nk - 1),
                                   jnp.maximum(k - jnp.int32(1),
                                               jnp.int32(0))))

    pop_in = pl.BlockSpec((S, Q, 1, NY, NX),
                          lambda k: (0, 0, in_band(k), 0, 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, 1, NY, NX),
                           lambda k: (0, 0, out_band(k), 0, 0),
                           memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((1, NY, NX), lambda k: (in_band(k), 0, 0),
                          memory_space=pltpu.VMEM)
    pk = pl.BlockSpec((fld_dtype_planes, 1, NY, NX),
                      lambda k: (0, in_band(k), 0, 0),
                      memory_space=pltpu.VMEM)
    return pop_in, pop_out, fld_in, pk


def _scratch3(NY, NX, dt):
    return [
        pltpu.VMEM((_Q, _S, NY, NX), dt),   # prev
        pltpu.VMEM((5, _S, NY, NX), dt),    # zlast (+z planes)
        pltpu.VMEM((_Q, _S, NY, NX), dt),   # b0 (slice-0 planes)
        pltpu.VMEM((5, _S, NY, NX), dt),    # b1 (slice-1 -z planes)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2",
                     "interpret", "neutral_ref"),
)
def collide_stream3d_f(
    f, Ex, Ey, Ez, *,
    taus, q_e: float, q_i: float, m_e: float, m_i: float, cs2: float,
    interpret: bool = False, neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mass side: (f_streamed, pack, rho_q). pack = (12, NZ, NY, NX)."""
    S, Q, NZ, NY, NX = f.shape
    check_vmem_split3d(NY, NX, f.dtype.itemsize)
    nk = NZ
    pop_in, pop_out, fld_in, pk = _specs3(S, Q, NY, NX, nk)

    def kernel(f_ref, ex_ref, ey_ref, ez_ref,
               fo_ref, pack_ref, rq_ref,
               prev, zlast, b0, b1):
        k = pl.program_id(0)

        def compute():
            Exs = ex_ref[0]
            Eys = ey_ref[0]
            Ezs = ez_ref[0]
            fv = f_ref[:]
            fv, _, dt_store = _cast_io(fv, fv)
            fsl = [[fv[s, i, 0] for i in range(_Q)] for s in range(_S)]
            mac = update_macro3(fsl, None, Exs, Eys, Ezs,
                                q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                                neutral_ref=neutral_ref)
            rq_ref[0] = mac.rho_q
            for s in range(3):
                pack_ref[s, 0] = mac.rho_raw[s]
                pack_ref[3 + s, 0] = mac.ux[s]
                pack_ref[6 + s, 0] = mac.uy[s]
                pack_ref[9 + s, 0] = mac.uz[s]
            polys = {p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                                            mac.uz_pair[p], cs2)
                     for p in range(3)}
            out = []
            for s in range(_S):
                dirs = collide_species_f_dirs3(
                    s, fsl[s], mac, Exs, Eys, Ezs, taus=taus, q_e=q_e,
                    q_i=q_i, m_e=m_e, m_i=m_i, cs2=cs2, pair_polys=polys,
                    neutral_ref=neutral_ref)
                out.append([_roll2(_store(dirs[i], dt_store), _CY[i], _CX[i])
                            for i in range(_Q)])
            return out

        _slice_pipeline(compute, fo_ref, (prev, zlast, b0, b1), k, nk)

    dt = f.dtype
    fdt = Ex.dtype
    return pl.pallas_call(
        kernel,
        grid=(nk + 2,),
        in_specs=[pop_in, fld_in, fld_in, fld_in],
        out_specs=(pop_out, pk, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct((12, NZ, NY, NX), fdt),
            jax.ShapeDtypeStruct(Ex.shape, fdt),
        ),
        scratch_shapes=_scratch3(NY, NX, dt),
        input_output_aliases={0: 0},   # f updated in place in HBM
        cost_estimate=pl.CostEstimate(
            flops=int(2500 * NZ * NY * NX),
            bytes_accessed=3 * S * Q * NZ * NY * NX * dt.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, Ex, Ey, Ez)


@functools.partial(
    jax.jit,
    static_argnames=("taus", "cs2", "kb", "interpret"),
)
def collide_stream3d_g(
    g, pack, *,
    taus, cs2: float, kb: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Thermal side: g_streamed from g and the mass kernel's pack."""
    S, Q, NZ, NY, NX = g.shape
    check_vmem_split3d(NY, NX, g.dtype.itemsize)
    nk = NZ
    pop_in, pop_out, fld_in, pk = _specs3(S, Q, NY, NX, nk)

    def kernel(g_ref, pack_ref, go_ref, prev, zlast, b0, b1):
        k = pl.program_id(0)

        def compute():
            gv = g_ref[:]
            gv, _, dt_store = _cast_io(gv, gv)
            gsl = [[gv[s, i, 0] for i in range(_Q)] for s in range(_S)]
            mac = macros_from_pack3(pack_ref[:][:, 0], gsl)
            polys = {p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                                            mac.uz_pair[p], cs2)
                     for p in range(3)}
            out = []
            for s in range(_S):
                dirs = collide_species_g_dirs3(
                    s, gsl[s], mac, taus=taus, cs2=cs2, kb=kb,
                    pair_polys=polys, g_recip=_g_recip_for(dt_store))
                out.append([_roll2(_store(dirs[i], dt_store), _CY[i], _CX[i])
                            for i in range(_Q)])
            return out

        _slice_pipeline(compute, go_ref, (prev, zlast, b0, b1), k, nk)

    dt = g.dtype
    return pl.pallas_call(
        kernel,
        grid=(nk + 2,),
        in_specs=[pop_in, pk],
        out_specs=pop_out,
        out_shape=jax.ShapeDtypeStruct(g.shape, dt),
        scratch_shapes=_scratch3(NY, NX, dt),
        input_output_aliases={0: 0},   # g updated in place in HBM
        cost_estimate=pl.CostEstimate(
            flops=int(3500 * NZ * NY * NX),
            bytes_accessed=3 * S * Q * NZ * NY * NX * dt.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g, pack)


def check_vmem_split3d(NY: int, NX: int, itemsize: int) -> None:
    """Each split kernel's z-slice working set must fit the VMEM budget
    (one population array + the pack instead of f AND g)."""
    plane = NY * NX * itemsize
    plane_f = NY * NX * 4         # field/pack planes stay f32
    vmem = (
        (2 + 2) * _S * _Q * plane          # in/out pop, double-buffered
        + 2 * _Q * _S * plane              # prev + b0
        + 2 * 5 * _S * plane               # zlast + b1
        + 2 * 12 * plane_f                 # pack block x2 buffers
        # live collide temporaries are COMPUTE-dtype (f32 under bf16);
        # each split kernel runs ~half the physics of the single kernel
        # (cf. the 2-D split's 40 vs 80 coefficient)
        + 110 * NY * NX * max(itemsize, 4)
    )
    if vmem >= 95 * 1024 * 1024:
        raise ValueError(
            f"3-D split kernel slice working set ~{vmem >> 20} MB exceeds "
            f"VMEM budget for {NY}x{NX} slices")


def collide_stream_split3d(f, g, Ex, Ey, Ez, *, taus, q_e, q_i, m_e, m_i,
                           cs2, kb, interpret=False, neutral_ref=0.0):
    """Full fused 3-D collide+stream via the A/B kernel pair.

    Same contract as fused_step3d.collide_stream3d: (f_new, g_new, rho_q)."""
    f_new, pack, rho_q = collide_stream3d_f(
        f, Ex, Ey, Ez, taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
        cs2=cs2, interpret=interpret, neutral_ref=neutral_ref)
    g_new = collide_stream3d_g(g, pack, taus=taus, cs2=cs2, kb=kb,
                               interpret=interpret)
    return f_new, g_new, rho_q
