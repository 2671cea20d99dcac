"""Wide-grid fused step: two band-pipeline kernels (mass / thermal).

The single fused kernel (fused_step.py) needs the f AND g band blocks plus
their double buffers simultaneously in VMEM, capping the full-width band
(NX=4096 in f32 at the raised 100 MB budget; 8192 in bf16). The mass
collisions never read g, and the thermal side only
needs g plus 9 macro planes, so the step splits into two kernels that each
fit at twice the width:

  A (mass):    f, Ex, Ey  ->  f_streamed, pack(rho_raw, ux, uy), rho_q
  B (thermal): g, pack    ->  g_streamed

Each kernel runs the same software-pipelined band assembly as fused_step
(collide band k as values, assemble streamed band k-1 from scratch, two
epilogue steps for the periodic wrap). Extra HBM traffic vs the single
kernel: write+read of the 9-plane pack, ~17% of the population traffic.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import D2Q9
from ..ops.collide import collide_species_f_dirs, collide_species_g_dirs
from ..ops.equilibrium import equilibrium_wpolys
from ..ops.macros import macros_from_pack, update_macro
from .fused_step import _DIRS_NEG, _DIRS_POS, _roll_x

_CX = [int(c) for c in D2Q9.CX]
_CY = [int(c) for c in D2Q9.CY]
_Q = D2Q9.Q
_S = 3


def _assemble(out_ref, s, prev, last8, below_rows, ty):
    for i in range(_Q):
        cy = _CY[i]
        prev_i = prev[i, s]
        if cy == 0:
            out_ref[s, i] = prev_i
        elif cy == 1:
            gi = _DIRS_POS.index(i)
            out_ref[s, i] = jnp.concatenate(
                (last8[gi, s, 7:8, :], prev_i[: ty - 1]), axis=0)
        else:
            gi = _DIRS_NEG.index(i)
            out_ref[s, i] = jnp.concatenate(
                (prev_i[1:], below_rows[gi]), axis=0)


def _band_pipeline(kernel_compute, out_ref, extra_scratch, k, nk, ty):
    """Shared march/epilogue structure for one population set.

    kernel_compute() -> per-species x-rolled plane lists for the CURRENT
    input band (called at steps k < nk only; band 0's planes are kept in
    b0 scratch so the final wrap assembly never re-reads the input — the
    population buffer is aliased to the output and updated in place).
    extra_scratch = (prev, last8, b0, b1) with b0 holding full band planes.
    """
    prev, last8, b0, b1 = extra_scratch

    @pl.when(k < nk)
    def _():
        v = kernel_compute()
        for s in range(_S):
            @pl.when(k >= 1)
            def _(s=s):
                below = [v[s][i][0:1] for i in _DIRS_NEG]
                _assemble(out_ref, s, prev, last8, below, ty)

            @pl.when(k == 0)
            def _(s=s):
                for i in range(_Q):
                    b0[i, s] = v[s][i]

            if nk > 1:
                @pl.when(k == 1)
                def _(s=s):
                    for gi, i in enumerate(_DIRS_NEG):
                        b1[gi, s] = v[s][i][0:8]

            @pl.when(k >= 1)
            def _(s=s):
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi, s] = prev[i, s, ty - 8:, :]
            for i in range(_Q):
                prev[i, s] = v[s][i]

    @pl.when(k == nk)
    def _():
        for s in range(_S):
            below = [b0[i, s, 0:1, :] for i in _DIRS_NEG]
            _assemble(out_ref, s, prev, last8, below, ty)

    @pl.when(k == nk + 1)
    def _():
        for s in range(_S):
            for i in range(_Q):
                cy = _CY[i]
                if cy == 0:
                    out_ref[s, i] = b0[i, s]
                elif cy == 1:
                    out_ref[s, i] = jnp.concatenate(
                        (prev[i, s, ty - 1: ty, :], b0[i, s, : ty - 1]),
                        axis=0)
                else:
                    gi = _DIRS_NEG.index(i)
                    if nk == 1:
                        below = b0[i, s, 0:1, :]
                    else:
                        below = b1[gi, s, 0:1, :]
                    out_ref[s, i] = jnp.concatenate(
                        (b0[i, s, 1:], below), axis=0)


def _specs(S, Q, ty, NX, nk):
    def in_band(k):
        # clamped; never re-fetch band 0 (aliased outputs overwrite it)
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk + 1, jnp.int32(0),
                 jnp.where(k == nk, jnp.int32(nk - 1),
                           jnp.maximum(k - jnp.int32(1), jnp.int32(0))))

    pop_in = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pk = pl.BlockSpec((9, ty, NX), lambda k: (0, in_band(k), 0),
                      memory_space=pltpu.VMEM)
    return pop_in, pop_out, fld_in, pk


def _scratch(ty, NX, dt):
    return [
        pltpu.VMEM((_Q, _S, ty, NX), dt),   # prev
        pltpu.VMEM((3, _S, 8, NX), dt),     # last8
        pltpu.VMEM((_Q, _S, ty, NX), dt),   # b0 (band-0 planes)
        pltpu.VMEM((3, _S, 8, NX), dt),     # b1
    ]


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2",
                     "interpret", "band", "neutral_ref"),
)
def collide_stream_f(
    f, Ex, Ey, *,
    taus, q_e: float, q_i: float, m_e: float, m_i: float, cs2: float,
    interpret: bool = False, band: int = 0, neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mass side: (f_streamed, pack, rho_q). pack = (9, NY, NX)."""
    S, Q, NY, NX = f.shape
    ty = band or _pick_band_split(NY, NX, f.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"band height {ty} invalid for NY={NY}")
    nk = NY // ty
    pop_in, pop_out, fld_in, pk = _specs(S, Q, ty, NX, nk)

    def kernel(f_ref, ex_ref, ey_ref, fo_ref, pack_ref, rq_ref,
               prev, last8, b0, b1):
        k = pl.program_id(0)

        def compute():
            Exb = ex_ref[:]
            Eyb = ey_ref[:]
            fb = f_ref[:]
            mac = update_macro(fb, None, Exb, Eyb,
                               q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                               neutral_ref=neutral_ref)
            rq_ref[:] = mac.rho_q
            for s in range(3):
                pack_ref[s] = mac.rho_raw[s]
                pack_ref[3 + s] = mac.ux[s]
                pack_ref[6 + s] = mac.uy[s]
            polys = {p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p],
                                           cs2) for p in range(3)}
            out = []
            for s in range(_S):
                dirs = collide_species_f_dirs(
                    s, fb[s], mac, Exb, Eyb, taus=taus, q_e=q_e, q_i=q_i,
                    m_e=m_e, m_i=m_i, cs2=cs2, pair_polys=polys,
                    neutral_ref=neutral_ref)
                out.append([_roll_x(dirs[i], _CX[i]) for i in range(_Q)])
            return out

        _band_pipeline(compute, fo_ref, (prev, last8, b0, b1), k, nk, ty)

    dt = f.dtype
    return pl.pallas_call(
        kernel,
        grid=(nk + 2,),
        in_specs=[pop_in, fld_in, fld_in],
        out_specs=(pop_out, pk, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct((9, NY, NX), dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=_scratch(ty, NX, dt),
        input_output_aliases={0: 0},   # f updated in place in HBM
        cost_estimate=pl.CostEstimate(
            flops=int(1200 * NY * NX),
            bytes_accessed=3 * S * Q * NY * NX * dt.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, Ex, Ey)


@functools.partial(
    jax.jit,
    static_argnames=("taus", "cs2", "kb", "interpret", "band"),
)
def collide_stream_g(
    g, pack, *,
    taus, cs2: float, kb: float,
    interpret: bool = False, band: int = 0,
) -> jnp.ndarray:
    """Thermal side: g_streamed from g and the mass kernel's pack."""
    S, Q, NY, NX = g.shape
    ty = band or _pick_band_split(NY, NX, g.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"band height {ty} invalid for NY={NY}")
    nk = NY // ty
    pop_in, pop_out, fld_in, pk = _specs(S, Q, ty, NX, nk)

    def kernel(g_ref, pack_ref, go_ref, prev, last8, b0, b1):
        k = pl.program_id(0)

        def compute():
            gb = g_ref[:]
            mac = macros_from_pack(pack_ref[:], gb)
            polys = {p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p],
                                           cs2) for p in range(3)}
            out = []
            for s in range(_S):
                dirs = collide_species_g_dirs(
                    s, gb[s], mac, taus=taus, cs2=cs2, kb=kb,
                    pair_polys=polys)
                out.append([_roll_x(dirs[i], _CX[i]) for i in range(_Q)])
            return out

        _band_pipeline(compute, go_ref, (prev, last8, b0, b1), k, nk, ty)

    dt = g.dtype
    return pl.pallas_call(
        kernel,
        grid=(nk + 2,),
        in_specs=[pop_in, pk],
        out_specs=pop_out,
        out_shape=jax.ShapeDtypeStruct(g.shape, dt),
        scratch_shapes=_scratch(ty, NX, dt),
        input_output_aliases={0: 0},   # g updated in place in HBM
        cost_estimate=pl.CostEstimate(
            flops=int(1800 * NY * NX),
            bytes_accessed=3 * S * Q * NY * NX * dt.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g, pack)


def _pick_band_split(NY: int, NX: int, itemsize: int) -> int:
    """Band height for the split kernels (~13 MB VMEM budget each)."""
    for ty in (8, 16, 32):
        if NY % ty:
            continue
        vmem = (
            2 * 2 * _S * _Q * ty * NX * itemsize   # in/out pop x2 buffers
            + 2 * _S * _Q * ty * NX * itemsize      # prev + b0 planes
            + 2 * 9 * ty * NX * itemsize            # pack block x2 buffers
            + 3 * 3 * _S * 8 * NX * itemsize        # edge chunks
            + 40 * ty * NX * itemsize               # live temporaries
        )
        if vmem < 90 * 1024 * 1024:
            return ty
    raise ValueError(f"no feasible split band height for {NY}x{NX}")


def collide_stream_split(f, g, Ex, Ey, *, taus, q_e, q_i, m_e, m_i, cs2, kb,
                         interpret=False, band=0, neutral_ref=0.0):
    """Full fused collide+stream via the A/B kernel pair.

    Same contract as fused_step.collide_stream: (f_new, g_new, rho_q)."""
    f_new, pack, rho_q = collide_stream_f(
        f, Ex, Ey, taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i, cs2=cs2,
        interpret=interpret, band=band, neutral_ref=neutral_ref)
    g_new = collide_stream_g(g, pack, taus=taus, cs2=cs2, kb=kb,
                             interpret=interpret, band=band)
    return f_new, g_new, rho_q
