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
is handled by 1-ROW REDUNDANT HALO COLLIDE + in-register row selects:
each panel's block input is exactly its own ty rows, plus a tiny
pre-extracted (2, NX) halo slab per array holding the PRE-collision row
above (p*ty - 1) and below ((p+1)*ty) the panel. The kernel collides the
slab redundantly (2 rows ~ 3% extra VPU at ty = 64, padded to one
sublane group), runs the (y, x) value rolls panel-locally (wrong only at
the 2 boundary rows for the 10 cy = +-1 directions), and overwrites
those rows with the halo's post-collision values via
`where(row_iota == r, halo_row, plane)` — a lane-wise select, no
concatenates, no relayout. Collision is elementwise per cell (the
direction reductions are fixed-order Python loops), so the 2-row
recompute is BITWISE equal to the neighbor panel's own result and the
bf16 f-bitwise contract holds.

Design history (ablation-measured at 512^2 x 64 bf16, DMA floor
~11.4 ms): v1 collided 8-row redundant halo strips concatenated in-kernel
(+25% reads/compute, 114 concats) — 4.2x off the floor. v2 collided
exact panels, exported boundary rows to a side output and fixed edges
XLA-side — 19.3 ms, of which the XLA fixup pass cost 2.5 ms and the
packed export concat most of a 3.3 ms in-VMEM overhead. v3 (this)
removes both.

In-place HBM update via input_output_aliases: the halo slabs are
materialized XLA-side before the call (reads ~2/ty of the population
bytes), so panels never read HBM rows another panel may already have
overwritten.
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
_DIRS_YPOS = [i for i in range(_Q) if _CY[i] == 1]   # need neighbor's LAST row
_DIRS_YNEG = [i for i in range(_Q) if _CY[i] == -1]  # need neighbor's FIRST row


def _make_panel_kernel(params, ty, nk):
    def collide_slab(fsl, gsl, Ex, Ey, Ez, dt_store, rq_ref=None):
        """Shared collide pipeline on per-direction plane lists; returns
        store-dtype post-collision plane lists. Elementwise per cell, so
        the (2, NX) halo slab recompute is bitwise equal to the neighbor
        panel's own (ty, NX) result."""
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
        fpost, gpost = [], []
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
            fpost.append(f_dirs)
            gpost.append(g_dirs)
        return fpost, gpost

    def collide_panel(f_ref, g_ref, hf_ref, hg_ref,
                      ex_ref, ey_ref, ez_ref, hex_ref, hey_ref, hez_ref,
                      rq_ref):
        """Collide the (ty, NX) panel slice + its (2, NX) halo slab;
        return (y, x)-rolled plane lists with halo-corrected boundary
        rows (slab row 0 = y-row p*ty - 1, slab row 1 = (p+1)*ty)."""
        Ex, Ey, Ez = ex_ref[0], ey_ref[0], ez_ref[0]
        f, g, dt_store = _cast_io(f_ref[:], g_ref[:])
        fsl = [[f[s, i, 0] for i in range(_Q)] for s in range(_S)]
        gsl = [[g[s, i, 0] for i in range(_Q)] for s in range(_S)]
        fpost, gpost = collide_slab(fsl, gsl, Ex, Ey, Ez, dt_store, rq_ref)

        hf, hg, _ = _cast_io(hf_ref[0], hg_ref[0])
        hfsl = [[hf[s, i, 0] for i in range(_Q)] for s in range(_S)]
        hgsl = [[hg[s, i, 0] for i in range(_Q)] for s in range(_S)]
        hfpost, hgpost = collide_slab(hfsl, hgsl, hex_ref[0, 0],
                                      hey_ref[0, 0], hez_ref[0, 0], dt_store)

        def rolled(post, hpost, s, i):
            plane = _roll2(post[s][i], _CY[i], _CX[i])
            if _CY[i] == 0:
                return plane
            # boundary row r streams from outside the panel: substitute
            # the halo's post-collision row, x-rolled like the plane
            hrow = hpost[s][i][0:1] if _CY[i] == 1 else hpost[s][i][1:2]
            if _CX[i]:
                hrow = jnp.roll(hrow, _CX[i], axis=-1)
            r = 0 if _CY[i] == 1 else ty - 1
            row_iota = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
            return jnp.where(row_iota == r, hrow, plane)

        fv = [[rolled(fpost, hfpost, s, i) for i in range(_Q)]
              for s in range(_S)]
        gv = [[rolled(gpost, hgpost, s, i) for i in range(_Q)]
              for s in range(_S)]
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

    def kernel(f_ref, g_ref, hf_ref, hg_ref,
               ex_ref, ey_ref, ez_ref, hex_ref, hey_ref, hez_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, fzlast, gzlast, fb0, gb0, fb1, gb1):
        k = pl.program_id(1)   # z index (innermost); panel p = program_id(0)

        @pl.when(k < nk)
        def _():
            fv, gv = collide_panel(f_ref, g_ref, hf_ref, hg_ref,
                                   ex_ref, ey_ref, ez_ref,
                                   hex_ref, hey_ref, hez_ref, rq_ref)
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


def _halo_slabs(a, ty: int):
    """Pre-collision 1-row halo slabs for every panel, panel-major.

    a: (..., NY, NX) -> (P, ..., 2, NX): slab row 0 = y-row p*ty - 1 (the
    row ABOVE panel p, periodic), row 1 = y-row (p + 1) * ty (the row
    below). Reads only 2/ty of the array's rows (XLA strided slices), and
    materializing it BEFORE the kernel call keeps the in-place HBM update
    safe — panels never read rows another panel already overwrote.
    """
    NY = a.shape[-2]
    P = NY // ty
    ar = a.reshape(a.shape[:-2] + (P, ty, a.shape[-1]))
    up = jnp.roll(ar[..., ty - 1, :], 1, axis=-2)   # (..., P, NX)
    dn = jnp.roll(ar[..., 0, :], -1, axis=-2)
    slab = jnp.stack((up, dn), axis=-2)             # (..., P, 2, NX)
    return jnp.moveaxis(slab, -3, 0)                # (P, ..., 2, NX)


def pick_panel3d(NY: int, NX: int, itemsize: int) -> int:
    """Largest panel height whose working set fits VMEM."""
    for ty in (256, 128, 64, 32, 16, 8):
        if NY % ty:
            continue
        plane = ty * NX * itemsize
        vmem = (
            (2 + 2) * 2 * _S * _Q * plane          # in/out f+g x2 buffers
            + 2 * _Q * _S * plane                  # prev f+g
            + 2 * _Q * _S * plane                  # b0 f+g
            + 4 * 5 * _S * plane                   # zlast + b1 f+g
            # halo slab blocks (f+g, 2 rows), double-buffered
            + 2 * 2 * _S * _Q * 2 * NX * itemsize
            # live collide temporaries are COMPUTE-dtype (f32 under bf16);
            # the halo slab's own temporaries pad to one 8-row group
            + 200 * (ty + 8) * NX * max(itemsize, 4)
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
    halo_rows=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f_streamed, g_streamed, rho_q), same contract as collide_stream3d,
    for cross-sections wider than the split pair's budget.

    halo_rows: None for a periodic (single-device) lattice. For a
    y-SHARDED lattice (parallel/fused_sharded.make_fused_sharded_step3d_y)
    pass the tuple (up_f, up_g, up_Ex, up_Ey, up_Ez, dn_f, dn_g, dn_Ex,
    dn_Ey, dn_Ez) of PRE-collision neighbor-shard rows — up_* = the y-row
    just above this shard (the previous device's last row; pops
    (S, Q, NZ, NX), fields (NZ, NX)), dn_* = the row just below (next
    device's first row). They replace the periodic wrap entries of the
    outermost panels' halo slabs; everything else is shard-local.
    """
    S, Q, NZ, NY, NX = f.shape
    ty = panel or pick_panel3d(NY, NX, f.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"panel height {ty} invalid for NY={NY}")
    P = NY // ty
    nk = NZ

    hf = _halo_slabs(f, ty)        # (P, S, Q, NZ, 2, NX)
    hg = _halo_slabs(g, ty)
    hEx = _halo_slabs(Ex, ty)      # (P, NZ, 2, NX)
    hEy = _halo_slabs(Ey, ty)
    hEz = _halo_slabs(Ez, ty)
    if halo_rows is not None:
        (up_f, up_g, up_Ex, up_Ey, up_Ez,
         dn_f, dn_g, dn_Ex, dn_Ey, dn_Ez) = halo_rows
        hf = hf.at[0, :, :, :, 0, :].set(up_f.astype(hf.dtype))
        hf = hf.at[P - 1, :, :, :, 1, :].set(dn_f.astype(hf.dtype))
        hg = hg.at[0, :, :, :, 0, :].set(up_g.astype(hg.dtype))
        hg = hg.at[P - 1, :, :, :, 1, :].set(dn_g.astype(hg.dtype))
        hEx = hEx.at[0, :, 0, :].set(up_Ex)
        hEx = hEx.at[P - 1, :, 1, :].set(dn_Ex)
        hEy = hEy.at[0, :, 0, :].set(up_Ey)
        hEy = hEy.at[P - 1, :, 1, :].set(dn_Ey)
        hEz = hEz.at[0, :, 0, :].set(up_Ez)
        hEz = hEz.at[P - 1, :, 1, :].set(dn_Ez)

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
    # halo slab blocks: the 2-row dim is a FULL block (Mosaic requires the
    # second-minor block dim to divide by 8 or span the array dim)
    halo_pop = pl.BlockSpec((1, S, Q, 1, 2, NX),
                            lambda p, k: (p, 0, 0, in_band(k), 0, 0),
                            memory_space=pltpu.VMEM)
    halo_fld = pl.BlockSpec((1, 1, 2, NX),
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
        in_specs=[pop_in, pop_in, halo_pop, halo_pop,
                  fld_in, fld_in, fld_in,
                  halo_fld, halo_fld, halo_fld],
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
        # in-place HBM update: panels read only their own rows (halo slabs
        # were materialized before the call) and each out slice is written
        # one grid step after its input was consumed
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(6000 * NZ * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, hf, hg, Ex, Ey, Ez, hEx, hEy, hEz)
