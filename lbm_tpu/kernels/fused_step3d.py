"""Fused collide+stream Pallas kernel for the D3Q19 plasma (periodic BC).

The 3-D analog of fused_step.py: one pass over HBM per step for everything
except the Poisson solve. The lattice is processed in single z-slice bands
(tz = 1):

  * collide: moments -> 36 equilibria -> triple-BGK + Guo + DDF thermal
    (the shared ops from lbm_tpu.ops.d3), entirely in VMEM;
  * x/y-streaming: periodic within a slice, applied as in-VMEM value rolls
    (concatenate of value slices — arbitrary offsets are legal on values
    for both lanes and sublanes);
  * z-streaming: the software pipeline across grid steps. Because a band
    is exactly one slice, the z-shift needs WHOLE planes, not edge rows:
    streamed slice k-1 takes cz=+1 planes from slice k-2 (zlast scratch),
    cz=0 from slice k-1 (prev), cz=-1 from slice k (just collided). Two
    epilogue steps close the periodic wrap exactly like the 2-D kernel
    (slice 0 is re-assembled from scratch-saved planes; its out block is
    written twice, placeholder first).

In-place HBM update via input_output_aliases, same write-after-read
argument as the 2-D kernel. VMEM budget: the slice working set is
S*Q*NY*NX bytes per population array; check_vmem3d's accounting (744
double-counted in/out planes + ~200 temp planes vs the 95 MB gate) admits
f32 cross-sections to ~152-160^2 and bf16 to ~216^2 under the 100 MB
scoped budget (the z extent is unconstrained — it is the pipeline axis).
Wider cross-sections go to the mass/thermal split pair
(kernels/fused_split3d.py: bf16 to ~256^2, f32 to ~192^2).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import D3Q19
from ..ops.d3 import collide_species_dirs3, equilibrium_wpolys3, update_macro3
from .fused_step import _cast_io, _g_recip_for

_CX = [int(c) for c in D3Q19.CX]
_CY = [int(c) for c in D3Q19.CY]
_CZ = [int(c) for c in D3Q19.CZ]
_Q = D3Q19.Q
_S = 3

_DIRS_ZPOS = [i for i in range(_Q) if _CZ[i] == 1]
_DIRS_ZNEG = [i for i in range(_Q) if _CZ[i] == -1]


def _roll2(a: jnp.ndarray, cy: int, cx: int) -> jnp.ndarray:
    """Periodic (y, x) shift of a (NY, NX) value: out[y, x] = a[y-cy, x-cx]."""
    if cx:
        a = jnp.concatenate((a[:, -cx:], a[:, :-cx]), axis=1)
    if cy:
        a = jnp.concatenate((a[-cy:, :], a[:-cy, :]), axis=0)
    return a


def _make_kernel(params, nk):
    def collide_slice(f_ref, g_ref, ex_ref, ey_ref, ez_ref, rq_ref):
        """Collide the fetched z-slice; returns x/y-rolled plane lists."""
        Ex = ex_ref[0]
        Ey = ey_ref[0]
        Ez = ez_ref[0]
        f, g, dt_store = _cast_io(f_ref[:], g_ref[:])
        fsl = [[f[s, i, 0] for i in range(_Q)] for s in range(_S)]
        gsl = [[g[s, i, 0] for i in range(_Q)] for s in range(_S)]
        mac = update_macro3(fsl, gsl, Ex, Ey, Ez,
                            q_e=params["q_e"], q_i=params["q_i"],
                            m_e=params["m_e"], m_i=params["m_i"],
                            neutral_ref=params["neutral_ref"])
        rq_ref[0] = mac.rho_q
        pair_polys = {
            p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                                   mac.uz_pair[p], params["cs2"])
            for p in range(3)
        }
        fv, gv = [], []
        for s in range(_S):
            f_dirs, g_dirs = collide_species_dirs3(
                s, fsl[s], gsl[s], mac, Ex, Ey, Ez,
                taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
                m_e=params["m_e"], m_i=params["m_i"],
                cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys,
                neutral_ref=params["neutral_ref"],
                g_recip=_g_recip_for(dt_store))
            if dt_store is not None:
                f_dirs = [d.astype(dt_store) for d in f_dirs]
                g_dirs = [d.astype(dt_store) for d in g_dirs]
            fv.append([_roll2(f_dirs[i], _CY[i], _CX[i]) for i in range(_Q)])
            gv.append([_roll2(g_dirs[i], _CY[i], _CX[i]) for i in range(_Q)])
        return fv, gv

    def assemble(out_ref, s, prev, zlast, below):
        """Write species s of streamed slice k-1.

        prev: scratch (Q, S, NY, NX) with slice k-1's rolled planes;
        zlast: (5, S, NY, NX) with slice k-2's cz=+1 planes;
        below[gi]: (NY, NX) value, slice k's cz=-1 plane.
        """
        for i in range(_Q):
            cz = _CZ[i]
            if cz == 0:
                out_ref[s, i, 0] = prev[i, s]
            elif cz == 1:
                out_ref[s, i, 0] = zlast[_DIRS_ZPOS.index(i), s]
            else:
                out_ref[s, i, 0] = below[_DIRS_ZNEG.index(i)]

    def kernel(f_ref, g_ref, ex_ref, ey_ref, ez_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, fzlast, gzlast, fb0, gb0, fb1, gb1):
        k = pl.program_id(0)

        # ---- main march: collide slice k, assemble slice k-1 ----
        @pl.when(k < nk)
        def _():
            fv, gv = collide_slice(f_ref, g_ref, ex_ref, ey_ref, ez_ref,
                                   rq_ref)
            for s in range(_S):
                @pl.when(k >= 1)
                def _(s=s):
                    below_f = [fv[s][i] for i in _DIRS_ZNEG]
                    below_g = [gv[s][i] for i in _DIRS_ZNEG]
                    assemble(fo_ref, s, fprev, fzlast, below_f)
                    assemble(go_ref, s, gprev, gzlast, below_g)

                @pl.when(k == 0)
                def _(s=s):
                    # slice 0's planes for the wrap epilogues (the outputs
                    # alias the inputs, so slice 0 cannot be re-fetched)
                    for i in range(_Q):
                        fb0[i, s] = fv[s][i]
                        gb0[i, s] = gv[s][i]

                if nk > 1:
                    @pl.when(k == 1)
                    def _(s=s):
                        for gi, i in enumerate(_DIRS_ZNEG):
                            fb1[gi, s] = fv[s][i]
                            gb1[gi, s] = gv[s][i]

                # zlast <- prev (+z planes), then prev <- current planes
                for gi, i in enumerate(_DIRS_ZPOS):
                    fzlast[gi, s] = fprev[i, s]
                    gzlast[gi, s] = gprev[i, s]
                for i in range(_Q):
                    fprev[i, s] = fv[s][i]
                    gprev[i, s] = gv[s][i]

        # ---- epilogue 1 (k == nk): slice nk-1; below plane is slice 0's ----
        @pl.when(k == nk)
        def _():
            for s in range(_S):
                below_f = [fb0[i, s] for i in _DIRS_ZNEG]
                below_g = [gb0[i, s] for i in _DIRS_ZNEG]
                assemble(fo_ref, s, fprev, fzlast, below_f)
                assemble(go_ref, s, gprev, gzlast, below_g)

        # ---- epilogue 2 (k == nk+1): slice 0 from its saved planes; the
        # +z planes come from slice nk-1 (= prev, untouched by epilogue 1) --
        @pl.when(k == nk + 1)
        def _():
            for s in range(_S):
                for i in range(_Q):
                    cz = _CZ[i]
                    if cz == 0:
                        fo_ref[s, i, 0] = fb0[i, s]
                        go_ref[s, i, 0] = gb0[i, s]
                    elif cz == 1:
                        fo_ref[s, i, 0] = fprev[i, s]
                        go_ref[s, i, 0] = gprev[i, s]
                    else:
                        gi = _DIRS_ZNEG.index(i)
                        if nk == 1:
                            fo_ref[s, i, 0] = fb0[i, s]
                            go_ref[s, i, 0] = gb0[i, s]
                        else:
                            fo_ref[s, i, 0] = fb1[gi, s]
                            go_ref[s, i, 0] = gb1[gi, s]

    return kernel


def _make_halo_kernel3d(params, nk):
    """Kernel variant for z-sharded (non-wrapping) domains.

    The z-neighbors' boundary slices arrive as explicit halo inputs
    (pre-collision, exchanged over ICI by the shard_map wrapper) and are
    collided redundantly in-kernel, so no periodic-wrap epilogues are
    needed: grid = nk + 1 (cf. the 2-D fused_step._make_halo_kernel).

      k == 0:        collide the upper halo slice -> zlast scratch;
                     collide slice 0 -> prev.
      k in [1, nk):  collide slice k; assemble slice k-1.
      k == nk:       collide the lower halo slice; its planes are the
                     "below" input assembling slice nk-1.
    """
    def collide_slice(f_ref, g_ref, ex_ref, ey_ref, ez_ref, rq_ref=None):
        Ex = ex_ref[0]
        Ey = ey_ref[0]
        Ez = ez_ref[0]
        f, g, dt_store = _cast_io(f_ref[:], g_ref[:])
        fsl = [[f[s, i, 0] for i in range(_Q)] for s in range(_S)]
        gsl = [[g[s, i, 0] for i in range(_Q)] for s in range(_S)]
        mac = update_macro3(fsl, gsl, Ex, Ey, Ez,
                            q_e=params["q_e"], q_i=params["q_i"],
                            m_e=params["m_e"], m_i=params["m_i"],
                            neutral_ref=params["neutral_ref"])
        if rq_ref is not None:
            rq_ref[0] = mac.rho_q
        pair_polys = {
            p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                                   mac.uz_pair[p], params["cs2"])
            for p in range(3)
        }
        fv, gv = [], []
        for s in range(_S):
            f_dirs, g_dirs = collide_species_dirs3(
                s, fsl[s], gsl[s], mac, Ex, Ey, Ez,
                taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
                m_e=params["m_e"], m_i=params["m_i"],
                cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys,
                neutral_ref=params["neutral_ref"],
                g_recip=_g_recip_for(dt_store))
            if dt_store is not None:
                f_dirs = [d.astype(dt_store) for d in f_dirs]
                g_dirs = [d.astype(dt_store) for d in g_dirs]
            fv.append([_roll2(f_dirs[i], _CY[i], _CX[i]) for i in range(_Q)])
            gv.append([_roll2(g_dirs[i], _CY[i], _CX[i]) for i in range(_Q)])
        return fv, gv

    def assemble(out_ref, s, prev, zlast, below):
        for i in range(_Q):
            cz = _CZ[i]
            if cz == 0:
                out_ref[s, i, 0] = prev[i, s]
            elif cz == 1:
                out_ref[s, i, 0] = zlast[_DIRS_ZPOS.index(i), s]
            else:
                out_ref[s, i, 0] = below[_DIRS_ZNEG.index(i)]

    def kernel(f_ref, g_ref, ex_ref, ey_ref, ez_ref,
               fup_ref, gup_ref, exu_ref, eyu_ref, ezu_ref,
               fdn_ref, gdn_ref, exd_ref, eyd_ref, ezd_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, fzlast, gzlast):
        k = pl.program_id(0)

        @pl.when(k < nk)
        def _():
            @pl.when(k == 0)
            def _():
                fvu, gvu = collide_slice(fup_ref, gup_ref,
                                         exu_ref, eyu_ref, ezu_ref)
                for s in range(_S):
                    for gi, i in enumerate(_DIRS_ZPOS):
                        fzlast[gi, s] = fvu[s][i]
                        gzlast[gi, s] = gvu[s][i]

            fv, gv = collide_slice(f_ref, g_ref, ex_ref, ey_ref, ez_ref,
                                   rq_ref)
            for s in range(_S):
                @pl.when(k >= 1)
                def _(s=s):
                    below_f = [fv[s][i] for i in _DIRS_ZNEG]
                    below_g = [gv[s][i] for i in _DIRS_ZNEG]
                    assemble(fo_ref, s, fprev, fzlast, below_f)
                    assemble(go_ref, s, gprev, gzlast, below_g)

                @pl.when(k >= 1)
                def _(s=s):
                    for gi, i in enumerate(_DIRS_ZPOS):
                        fzlast[gi, s] = fprev[i, s]
                        gzlast[gi, s] = gprev[i, s]
                for i in range(_Q):
                    fprev[i, s] = fv[s][i]
                    gprev[i, s] = gv[s][i]

        @pl.when(k == nk)
        def _():
            fvd, gvd = collide_slice(fdn_ref, gdn_ref,
                                     exd_ref, eyd_ref, ezd_ref)
            for s in range(_S):
                below_f = [fvd[s][i] for i in _DIRS_ZNEG]
                below_g = [gvd[s][i] for i in _DIRS_ZNEG]
                assemble(fo_ref, s, fprev, fzlast, below_f)
                assemble(go_ref, s, gprev, gzlast, below_g)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "neutral_ref"),
)
def collide_stream_halo3d(
    f: jnp.ndarray,     # (3, Q, NZl, NY, NX) local z-shard
    g: jnp.ndarray,
    Ex: jnp.ndarray,    # (NZl, NY, NX)
    Ey: jnp.ndarray,
    Ez: jnp.ndarray,
    f_up: jnp.ndarray,  # (3, Q, 1, NY, NX) pre-collision slice from above
    g_up: jnp.ndarray,
    Ex_up: jnp.ndarray,  # (1, NY, NX)
    Ey_up: jnp.ndarray,
    Ez_up: jnp.ndarray,
    f_dn: jnp.ndarray,  # (3, Q, 1, NY, NX) slice from below
    g_dn: jnp.ndarray,
    Ex_dn: jnp.ndarray,
    Ey_dn: jnp.ndarray,
    Ez_dn: jnp.ndarray,
    *,
    taus: Tuple[float, ...],
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused 3-D collide+stream for one z-shard with explicit halo slices.

    The upper halo is the single slice immediately above the shard (the
    up-neighbor's last slice), the lower halo the slice below; both carry
    their E fields. Returns (f_new, g_new, rho_q) for the local shard.
    """
    S, Q, NZ, NY, NX = f.shape
    check_vmem3d(NY, NX, f.dtype.itemsize)
    nk = NZ
    grid = (nk + 1,)

    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk, jnp.int32(nk - 1),
                 jnp.maximum(k - jnp.int32(1), jnp.int32(0)))

    pop_in = pl.BlockSpec((S, Q, 1, NY, NX),
                          lambda k: (0, 0, in_band(k), 0, 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((1, NY, NX), lambda k: (in_band(k), 0, 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, 1, NY, NX),
                           lambda k: (0, 0, out_band(k), 0, 0),
                           memory_space=pltpu.VMEM)
    halo_pop = pl.BlockSpec((S, Q, 1, NY, NX), lambda k: (0, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    halo_fld = pl.BlockSpec((1, NY, NX), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_halo_kernel3d(params, nk)
    dt = f.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, pop_in, fld_in, fld_in, fld_in,
                  halo_pop, halo_pop, halo_fld, halo_fld, halo_fld,
                  halo_pop, halo_pop, halo_fld, halo_fld, halo_fld],
        out_specs=(pop_out, pop_out, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((_Q, _S, NY, NX), dt),   # fprev
            pltpu.VMEM((_Q, _S, NY, NX), dt),   # gprev
            pltpu.VMEM((5, _S, NY, NX), dt),    # fzlast
            pltpu.VMEM((5, _S, NY, NX), dt),    # gzlast
        ],
        # in-place HBM update (no wrap refetch in the halo variant)
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(6000 * NZ * NY * NX),
            bytes_accessed=4 * S * Q * NZ * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex, Ey, Ez,
      f_up, g_up, Ex_up, Ey_up, Ez_up,
      f_dn, g_dn, Ex_dn, Ey_dn, Ez_dn)


def check_vmem3d(NY: int, NX: int, itemsize: int) -> None:
    """The z-slice working set must fit the scoped VMEM budget."""
    plane = NY * NX * itemsize
    vmem = (
        (2 + 2) * 2 * _S * _Q * plane      # in/out f+g, double-buffered
        + 2 * _Q * _S * plane              # prev f+g
        + 2 * _Q * _S * plane              # b0 f+g
        + 4 * 5 * _S * plane               # zlast + b1, f+g
        # live collide temporaries are COMPUTE-dtype (f32 under bf16)
        + 200 * NY * NX * max(itemsize, 4)
    )
    if vmem >= 95 * 1024 * 1024:
        raise ValueError(
            f"3-D fused kernel slice working set ~{vmem >> 20} MB exceeds "
            f"VMEM budget for {NY}x{NX} slices")


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "neutral_ref"),
)
def collide_stream3d(
    f: jnp.ndarray,   # (3, Q, NZ, NY, NX)
    g: jnp.ndarray,
    Ex: jnp.ndarray,  # (NZ, NY, NX)
    Ey: jnp.ndarray,
    Ez: jnp.ndarray,
    *,
    taus: Tuple[float, ...],
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f_streamed, g_streamed, rho_q) in one fused pass. Periodic BC."""
    S, Q, NZ, NY, NX = f.shape
    check_vmem3d(NY, NX, f.dtype.itemsize)
    nk = NZ
    grid = (nk + 2,)

    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk + 1, jnp.int32(0),
                 jnp.where(k == nk, jnp.int32(nk - 1),
                           jnp.maximum(k - jnp.int32(1), jnp.int32(0))))

    pop_in = pl.BlockSpec((S, Q, 1, NY, NX),
                          lambda k: (0, 0, in_band(k), 0, 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((1, NY, NX), lambda k: (in_band(k), 0, 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, 1, NY, NX),
                           lambda k: (0, 0, out_band(k), 0, 0),
                           memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_kernel(params, nk)

    dt = f.dtype
    bytes_pop = S * Q * NZ * NY * NX * dt.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, pop_in, fld_in, fld_in, fld_in],
        out_specs=(pop_out, pop_out, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((_Q, _S, NY, NX), dt),   # fprev
            pltpu.VMEM((_Q, _S, NY, NX), dt),   # gprev
            pltpu.VMEM((5, _S, NY, NX), dt),    # fzlast (+z planes)
            pltpu.VMEM((5, _S, NY, NX), dt),    # gzlast
            pltpu.VMEM((_Q, _S, NY, NX), dt),   # fb0 (slice-0 planes)
            pltpu.VMEM((_Q, _S, NY, NX), dt),   # gb0
            pltpu.VMEM((5, _S, NY, NX), dt),    # fb1 (slice-1 -z planes)
            pltpu.VMEM((5, _S, NY, NX), dt),    # gb1
        ],
        # in-place HBM update: out slice b is written at grid step b+1,
        # after its input was consumed at step b (slice 0 is written twice —
        # placeholder at k=1, real content at k=nk+1 — and never re-read;
        # its planes live in fb0/gb0)
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(6000 * NZ * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex, Ey, Ez)
