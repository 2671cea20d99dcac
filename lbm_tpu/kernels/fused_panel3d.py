"""Y-paneled 3-D fused collide+stream (D3Q19, periodic) for cross-sections
past the mass/thermal split pair's VMEM budget.

The single 3-D kernel (fused_step3d.py) and the split pair
(fused_split3d.py) keep whole (NY, NX) z-slices in VMEM, capping the
cross-section (~216^2 / ~256^2 bf16). Here each z-slice is processed in
(ty, NX) y-panels, so the VMEM working set scales with ty and 512^2+
cross-sections stay fused on one chip instead of dropping to the ~87-MLUPS
jnp path.

Structure: grid = (P, NZ + 2) with P = NY/ty panels (z innermost, so each
panel runs the SAME z-slice software pipeline as the single kernel:
collide slice k, assemble streamed slice k-1 from scratch planes, two
epilogue steps close the periodic z-wrap). The y-coupling between panels
is handled like the sharded halo kernels handle device boundaries — by
REDUNDANT COLLISION: each panel's slice is collided extended by the 8
pre-collision rows above and below (strips extracted XLA-side before the
call, so the in-place HBM update cannot clobber them), the y/x value
rolls run on the extended (ty+16, NX) planes, and the result is cropped
to the panel's ty rows. Overhead vs the single kernel: 16/ty redundant
collide compute and one extra read of the strip rows (~2*8/ty of the
population read traffic).

In-place HBM update via input_output_aliases: panel p's outputs are
written behind its own reads (same argument as the single kernel), and
panels only ever read their own rows plus the pre-extracted strips.
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
from .fused_step3d import _roll2

_CX = [int(c) for c in D3Q19.CX]
_CY = [int(c) for c in D3Q19.CY]
_CZ = [int(c) for c in D3Q19.CZ]
_Q = D3Q19.Q
_S = 3

_DIRS_ZPOS = [i for i in range(_Q) if _CZ[i] == 1]
_DIRS_ZNEG = [i for i in range(_Q) if _CZ[i] == -1]


def _make_panel_kernel(params, ty, nk):
    def collide_ext(f_ref, g_ref, fup, gup, fdn, gdn,
                    ex_ref, ey_ref, ez_ref, exs_u, eys_u, ezs_u,
                    exs_d, eys_d, ezs_d, rq_ref):
        """Collide the 8+ty+8 extended slice; return panel-cropped,
        (y, x)-rolled plane lists."""
        up_f, up_g = fup[0], gup[0]                    # (S, Q, 1, 8, NX)
        dn_f, dn_g = fdn[0], gdn[0]
        Ex = jnp.concatenate((exs_u[0, 0], ex_ref[0], exs_d[0, 0]), axis=0)
        Ey = jnp.concatenate((eys_u[0, 0], ey_ref[0], eys_d[0, 0]), axis=0)
        Ez = jnp.concatenate((ezs_u[0, 0], ez_ref[0], ezs_d[0, 0]), axis=0)
        f, g, dt_store = _cast_io(f_ref[:], g_ref[:])
        uf, ug, _ = _cast_io(up_f, up_g)
        df, dg, _ = _cast_io(dn_f, dn_g)
        fsl = [[jnp.concatenate((uf[s, i, 0], f[s, i, 0], df[s, i, 0]),
                                axis=0) for i in range(_Q)]
               for s in range(_S)]
        gsl = [[jnp.concatenate((ug[s, i, 0], g[s, i, 0], dg[s, i, 0]),
                                axis=0) for i in range(_Q)]
               for s in range(_S)]
        mac = update_macro3(fsl, gsl, Ex, Ey, Ez,
                            q_e=params["q_e"], q_i=params["q_i"],
                            m_e=params["m_e"], m_i=params["m_i"],
                            neutral_ref=params["neutral_ref"])
        rq_ref[0] = mac.rho_q[8:8 + ty]
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
            # roll on the extended plane (neighbor rows supply cy = +-1),
            # then crop to the panel's rows
            fv.append([_roll2(f_dirs[i], _CY[i], _CX[i])[8:8 + ty]
                       for i in range(_Q)])
            gv.append([_roll2(g_dirs[i], _CY[i], _CX[i])[8:8 + ty]
                       for i in range(_Q)])
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

    def kernel(f_ref, g_ref, fup, gup, fdn, gdn,
               ex_ref, ey_ref, ez_ref, exs_u, eys_u, ezs_u,
               exs_d, eys_d, ezs_d,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, fzlast, gzlast, fb0, gb0, fb1, gb1):
        k = pl.program_id(1)   # z index (innermost); panel p = program_id(0)

        @pl.when(k < nk)
        def _():
            fv, gv = collide_ext(f_ref, g_ref, fup, gup, fdn, gdn,
                                 ex_ref, ey_ref, ez_ref,
                                 exs_u, eys_u, ezs_u, exs_d, eys_d, ezs_d,
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
                    for i in range(_Q):
                        fb0[i, s] = fv[s][i]
                        gb0[i, s] = gv[s][i]

                if nk > 1:
                    @pl.when(k == 1)
                    def _(s=s):
                        for gi, i in enumerate(_DIRS_ZNEG):
                            fb1[gi, s] = fv[s][i]
                            gb1[gi, s] = gv[s][i]

                for gi, i in enumerate(_DIRS_ZPOS):
                    fzlast[gi, s] = fprev[i, s]
                    gzlast[gi, s] = gprev[i, s]
                for i in range(_Q):
                    fprev[i, s] = fv[s][i]
                    gprev[i, s] = gv[s][i]

        @pl.when(k == nk)
        def _():
            for s in range(_S):
                below_f = [fb0[i, s] for i in _DIRS_ZNEG]
                below_g = [gb0[i, s] for i in _DIRS_ZNEG]
                assemble(fo_ref, s, fprev, fzlast, below_f)
                assemble(go_ref, s, gprev, gzlast, below_g)

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


def _y_strips(a, ty: int):
    """(up, dn) pre-collision strip stacks along a (..., NY, NX) array's
    y axis: up[p] = the 8 rows above panel p, dn[p] = the 8 rows below
    (periodic). Every slice is contiguous for ty >= 8."""
    NY = a.shape[-2]
    P = NY // ty
    ups, dns = [], []
    for p in range(P):
        r0 = (p * ty - 8) % NY
        ups.append(jax.lax.slice_in_dim(a, r0, r0 + 8, axis=a.ndim - 2))
        r1 = ((p + 1) * ty) % NY
        dns.append(jax.lax.slice_in_dim(a, r1, r1 + 8, axis=a.ndim - 2))
    return jnp.stack(ups), jnp.stack(dns)


def pick_panel3d(NY: int, NX: int, itemsize: int) -> int:
    """Largest panel height whose extended working set fits VMEM."""
    for ty in (256, 128, 64, 32, 16, 8):
        if NY % ty:
            continue
        plane = ty * NX * itemsize
        vmem = (
            (2 + 2) * 2 * _S * _Q * plane          # in/out f+g x2 buffers
            + 2 * 2 * 2 * _S * _Q * 8 * NX * itemsize  # strip blocks x2
            + 2 * _Q * _S * plane                  # prev f+g
            + 2 * _Q * _S * plane                  # b0 f+g
            + 4 * 5 * _S * plane                   # zlast + b1 f+g
            # live collide temporaries are COMPUTE-dtype on the EXTENDED
            # rows (f32 under bf16 storage)
            + 200 * (ty + 16) * NX * max(itemsize, 4)
        )
        if vmem < 90 * 1024 * 1024:
            return ty
    raise ValueError(
        f"no feasible 3-D panel height for {NY}x{NX} cross-sections")


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "neutral_ref", "panel"),
)
def collide_stream_panel3d(
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
    panel: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f_streamed, g_streamed, rho_q), same contract as collide_stream3d,
    for cross-sections wider than the split pair's budget."""
    S, Q, NZ, NY, NX = f.shape
    ty = panel or pick_panel3d(NY, NX, f.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"panel height {ty} invalid for NY={NY}")
    P = NY // ty
    nk = NZ

    f_up, f_dn = _y_strips(f, ty)      # (P, S, Q, NZ, 8, NX)
    g_up, g_dn = _y_strips(g, ty)
    ex_up, ex_dn = _y_strips(Ex, ty)   # (P, NZ, 8, NX)
    ey_up, ey_dn = _y_strips(Ey, ty)
    ez_up, ez_dn = _y_strips(Ez, ty)

    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk + 1, jnp.int32(0),
                 jnp.where(k == nk, jnp.int32(nk - 1),
                           jnp.maximum(k - jnp.int32(1), jnp.int32(0))))

    pop_in = pl.BlockSpec((S, Q, 1, ty, NX),
                          lambda p, k: (0, 0, in_band(k), p, 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, 1, ty, NX),
                           lambda p, k: (0, 0, out_band(k), p, 0),
                           memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((1, ty, NX), lambda p, k: (in_band(k), p, 0),
                          memory_space=pltpu.VMEM)
    strip_pop = pl.BlockSpec((1, S, Q, 1, 8, NX),
                             lambda p, k: (p, 0, 0, in_band(k), 0, 0),
                             memory_space=pltpu.VMEM)
    strip_fld = pl.BlockSpec((1, 1, 8, NX),
                             lambda p, k: (p, in_band(k), 0, 0),
                             memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_panel_kernel(params, ty, nk)

    dt = f.dtype
    bytes_pop = S * Q * NZ * NY * NX * dt.itemsize
    return pl.pallas_call(
        kernel,
        grid=(P, nk + 2),
        in_specs=[pop_in, pop_in,
                  strip_pop, strip_pop, strip_pop, strip_pop,
                  fld_in, fld_in, fld_in,
                  strip_fld, strip_fld, strip_fld,
                  strip_fld, strip_fld, strip_fld],
        out_specs=(pop_out, pop_out, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((_Q, _S, ty, NX), dt),   # fprev
            pltpu.VMEM((_Q, _S, ty, NX), dt),   # gprev
            pltpu.VMEM((5, _S, ty, NX), dt),    # fzlast
            pltpu.VMEM((5, _S, ty, NX), dt),    # gzlast
            pltpu.VMEM((_Q, _S, ty, NX), dt),   # fb0
            pltpu.VMEM((_Q, _S, ty, NX), dt),   # gb0
            pltpu.VMEM((5, _S, ty, NX), dt),    # fb1
            pltpu.VMEM((5, _S, ty, NX), dt),    # gb1
        ],
        # in-place HBM update: the strips were materialized before the
        # call, and each panel writes only behind its own reads
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(4000 * NZ * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, f_up, g_up, f_dn, g_dn,
      Ex, Ey, Ez, ex_up, ey_up, ez_up, ex_dn, ey_dn, ez_dn)
