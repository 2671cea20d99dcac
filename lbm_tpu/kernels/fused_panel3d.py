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


def _panel_helpers(params, ty):
    """Shared collide/assemble machinery for the periodic and z-halo
    panel kernels. All functions operate on VALUES already read from the
    refs (both kernels read blocks of identical shapes, so the physics
    and the y-halo substitution are written once)."""
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

    def collide_panel(fb, gb, hfb, hgb, Ex, Ey, Ez, hEx, hEy, hEz,
                      rq_ref=None):
        """Collide a (ty, NX) panel block + its (2, NX) halo slab; every
        input is a VALUE already read from its ref (fb/gb: (S, Q, 1, ty,
        NX) storage dtype; hfb/hgb: (S, Q, 1, 2, NX); fields (ty, NX) /
        (2, NX)). Returns (y, x)-rolled plane lists with halo-corrected
        boundary rows (slab row 0 = y-row p*ty - 1, slab row 1 =
        (p+1)*ty)."""
        f, g, dt_store = _cast_io(fb, gb)
        fsl = [[f[s, i, 0] for i in range(_Q)] for s in range(_S)]
        gsl = [[g[s, i, 0] for i in range(_Q)] for s in range(_S)]
        fpost, gpost = collide_slab(fsl, gsl, Ex, Ey, Ez, dt_store, rq_ref)

        hf, hg, _ = _cast_io(hfb, hgb)
        hfsl = [[hf[s, i, 0] for i in range(_Q)] for s in range(_S)]
        hgsl = [[hg[s, i, 0] for i in range(_Q)] for s in range(_S)]
        hfpost, hgpost = collide_slab(hfsl, hgsl, hEx, hEy, hEz, dt_store)

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

    return collide_panel, assemble


def _make_panel_kernel(params, ty, nk):
    collide_panel, assemble = _panel_helpers(params, ty)

    def kernel(f_ref, g_ref, hf_ref, hg_ref,
               ex_ref, ey_ref, ez_ref, hex_ref, hey_ref, hez_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, fzlast, gzlast, fb0, gb0, fb1, gb1):
        k = pl.program_id(1)   # z index (innermost); panel p = program_id(0)

        @pl.when(k < nk)
        def _():
            fv, gv = collide_panel(f_ref[:], g_ref[:], hf_ref[0], hg_ref[0],
                                   ex_ref[0], ey_ref[0], ez_ref[0],
                                   hex_ref[0, 0], hey_ref[0, 0],
                                   hez_ref[0, 0], rq_ref)
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


def _make_panel_zhalo_kernel(params, ty, nk):
    """Panel kernel variant for z-SHARDED (non-wrapping) domains.

    The z-neighbors' boundary slices arrive as explicit halo inputs
    (pre-collision, exchanged over ICI by the shard_map wrapper, packed
    up/dn along a leading axis selected by a k-dependent index map) and
    are collided redundantly in-kernel — same 1-row y-halo-slab protocol
    as the periodic kernel, with the slabs' outer rows carrying the
    (y, z)-diagonal corner rows. No periodic-wrap epilogues, so the b0/b1
    scratch pair disappears (cf. fused_step3d._make_halo_kernel3d):

      k == 0:           collide the UPPER halo slice panel -> zlast.
      k in [1, nk]:     collide real slice k-1; k >= 2 assembles
                        output slice k-2.
      k == nk + 1:      collide the LOWER halo slice panel; its planes
                        are the "below" input assembling slice nk-1.
    """
    collide_panel, assemble = _panel_helpers(params, ty)

    def collide_ud(fud_ref, gud_ref, hfud_ref, hgud_ref, eud_ref, heud_ref):
        return collide_panel(
            fud_ref[0], gud_ref[0], hfud_ref[0, 0], hgud_ref[0, 0],
            eud_ref[0, 0, 0], eud_ref[0, 1, 0], eud_ref[0, 2, 0],
            heud_ref[0, 0, 0, 0], heud_ref[0, 1, 0, 0],
            heud_ref[0, 2, 0, 0])

    def kernel(f_ref, g_ref, hf_ref, hg_ref,
               ex_ref, ey_ref, ez_ref, hex_ref, hey_ref, hez_ref,
               fud_ref, gud_ref, hfud_ref, hgud_ref, eud_ref, heud_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, fzlast, gzlast):
        k = pl.program_id(1)   # pipeline index; panel p = program_id(0)

        @pl.when(k == 0)
        def _():
            # the ud refs hold the UP slice here (index map: 0 iff k==0)
            fvu, gvu = collide_ud(fud_ref, gud_ref, hfud_ref, hgud_ref,
                                  eud_ref, heud_ref)
            for s in range(_S):
                for gi, i in enumerate(_DIRS_ZPOS):
                    fzlast[gi, s] = fvu[s][i]
                    gzlast[gi, s] = gvu[s][i]

        @pl.when((k >= 1) & (k <= nk))
        def _():
            fv, gv = collide_panel(f_ref[:], g_ref[:], hf_ref[0], hg_ref[0],
                                   ex_ref[0], ey_ref[0], ez_ref[0],
                                   hex_ref[0, 0], hey_ref[0, 0],
                                   hez_ref[0, 0], rq_ref)
            for s in range(_S):
                @pl.when(k >= 2)
                def _(s=s):
                    below_f = [fv[s][i] for i in _DIRS_ZNEG]
                    below_g = [gv[s][i] for i in _DIRS_ZNEG]
                    assemble(fo_ref, s, fprev, fzlast, below_f)
                    assemble(go_ref, s, gprev, gzlast, below_g)
                    # AFTER assembling: rotate the old prev's z+ planes
                    # into zlast (at k == 1 zlast must keep the up-halo
                    # and prev holds garbage)
                    for gi, i in enumerate(_DIRS_ZPOS):
                        fzlast[gi, s] = fprev[i, s]
                        gzlast[gi, s] = gprev[i, s]
                for i in range(_Q):
                    fprev[i, s] = fv[s][i]
                    gprev[i, s] = gv[s][i]

        @pl.when(k == nk + 1)
        def _():
            # ud refs hold the DOWN slice (index map: 1 for all k >= 1)
            fvd, gvd = collide_ud(fud_ref, gud_ref, hfud_ref, hgud_ref,
                                  eud_ref, heud_ref)
            for s in range(_S):
                below_f = [fvd[s][i] for i in _DIRS_ZNEG]
                below_g = [gvd[s][i] for i in _DIRS_ZNEG]
                assemble(fo_ref, s, fprev, fzlast, below_f)
                assemble(go_ref, s, gprev, gzlast, below_g)

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


def pick_panel3d(NY: int, NX: int, itemsize: int,
                 zhalo: bool = False) -> int:
    """Largest panel height whose working set fits VMEM."""
    for ty in (256, 128, 64, 32, 16, 8):
        if NY % ty:
            continue
        plane = ty * NX * itemsize
        if zhalo:
            # z-halo variant: no b0/b1 wrap scratch, but the packed up/dn
            # halo-slice blocks (f+g) ride along double-buffered
            vmem = (
                (2 + 2) * 2 * _S * _Q * plane      # in/out f+g x2 buffers
                + 2 * 2 * _S * _Q * plane          # ud f+g blocks x2
                + 2 * _Q * _S * plane              # prev f+g
                + 2 * 5 * _S * plane               # zlast f+g
                + 4 * 2 * _S * _Q * 2 * NX * itemsize  # y + ud slabs
                + 2 * 2 * 3 * plane                # ud field blocks (f32)
                + 200 * (ty + 8) * NX * max(itemsize, 4)
            )
        else:
            vmem = (
                (2 + 2) * 2 * _S * _Q * plane      # in/out f+g x2 buffers
                + 2 * _Q * _S * plane              # prev f+g
                + 2 * _Q * _S * plane              # b0 f+g
                + 4 * 5 * _S * plane               # zlast + b1 f+g
                # halo slab blocks (f+g, 2 rows), double-buffered
                + 2 * 2 * _S * _Q * 2 * NX * itemsize
                # live collide temporaries are COMPUTE-dtype (f32 under
                # bf16); the halo slab's own temporaries pad to one
                # 8-row group
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
    if ty < 8 or ty % 8 or NY % ty:
        # ty must divide NY AND be sublane-aligned: the (.., ty, NX) pop
        # blocks' second-minor dim must be a multiple of 8 or Mosaic
        # rejects the layout with an opaque lowering error
        raise ValueError(f"panel height {ty} invalid for NY={NY} "
                         f"(must divide NY and be a multiple of 8)")
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


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "neutral_ref", "panel"),
)
def collide_stream_panel3d_zhalo(
    f: jnp.ndarray,   # (3, Q, NZ_local, NY_local, NX)
    g: jnp.ndarray,
    Ex: jnp.ndarray,  # (NZ_local, NY_local, NX)
    Ey: jnp.ndarray,
    Ez: jnp.ndarray,
    zhalo,
    yrows,
    corners_up,
    corners_dn,
    *,
    taus: Tuple[float, ...],
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    neutral_ref: float = 0.0,
    panel: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Panel step for one shard of a (dz, dy) 2-D device mesh: explicit
    z-halo SLICES and y-halo ROWS, no periodic wraps. Used by
    parallel/fused_sharded.make_fused_sharded_step3d_yz.

    All halo inputs are PRE-collision (the kernel collides them
    redundantly — elementwise, so bitwise equal to the neighbor shard's
    own result):
      zhalo      = (up_f, up_g, up_Ex, up_Ey, up_Ez,
                    dn_f, dn_g, dn_Ex, dn_Ey, dn_Ez): the z-slice just
                   above (previous z-shard's last slice; pops
                   (S, Q, NY, NX), fields (NY, NX)) / just below.
      yrows      = same tuple layout with the y-row just above/below the
                   shard (pops (S, Q, NZ, NX), fields (NZ, NX)) — the
                   1-D y-sharded protocol of collide_stream_panel3d.
      corners_up = (above_f, above_g, above_Ex, above_Ey, above_Ez,
                    below_f, below_g, below_Ex, below_Ey, below_Ez):
                   the y-rows just above/below the shard WITHIN the up
                   z-halo slice (pops (S, Q, NX), fields (NX,)) — the
                   (y, z)-diagonal neighbors' corner rows.
      corners_dn = same for the down z-halo slice.
    """
    S, Q, NZ, NY, NX = f.shape
    ty = panel or pick_panel3d(NY, NX, f.dtype.itemsize, zhalo=True)
    if ty < 8 or ty % 8 or NY % ty:
        raise ValueError(f"panel height {ty} invalid for NY={NY} "
                         f"(must divide NY and be a multiple of 8)")
    P = NY // ty
    nk = NZ

    (up_f, up_g, up_Ex, up_Ey, up_Ez,
     dn_f, dn_g, dn_Ex, dn_Ey, dn_Ez) = yrows
    hf = _halo_slabs(f, ty)        # (P, S, Q, NZ, 2, NX)
    hg = _halo_slabs(g, ty)
    hEx = _halo_slabs(Ex, ty)      # (P, NZ, 2, NX)
    hEy = _halo_slabs(Ey, ty)
    hEz = _halo_slabs(Ez, ty)
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

    (fu, gu, Exu, Eyu, Ezu, fd, gd, Exd, Eyd, Ezd) = zhalo
    fu = fu.astype(f.dtype)
    fd = fd.astype(f.dtype)
    gu = gu.astype(g.dtype)
    gd = gd.astype(g.dtype)
    fud = jnp.stack((fu[:, :, None], fd[:, :, None]))   # (2,S,Q,1,NY,NX)
    gud = jnp.stack((gu[:, :, None], gd[:, :, None]))
    Eud = jnp.stack((
        jnp.stack((Exu, Eyu, Ezu))[:, None],
        jnp.stack((Exd, Eyd, Ezd))[:, None]))           # (2,3,1,NY,NX)

    def pop_ud_slab(a, above, below):
        # a: (S, Q, NY, NX) z-halo slice; above/below: (S, Q, NX)
        sl = _halo_slabs(a[:, :, None], ty)             # (P,S,Q,1,2,NX)
        sl = sl.at[0, :, :, :, 0, :].set(above[:, :, None].astype(sl.dtype))
        sl = sl.at[P - 1, :, :, :, 1, :].set(
            below[:, :, None].astype(sl.dtype))
        return sl

    def fld_ud_slab(a, above, below):
        # a: (NY, NX); above/below: (NX,)
        sl = _halo_slabs(a[None], ty)                   # (P,1,2,NX)
        sl = sl.at[0, :, 0, :].set(above[None])
        sl = sl.at[P - 1, :, 1, :].set(below[None])
        return sl

    (ufa, uga, uExa, uEya, uEza,
     ufb, ugb, uExb, uEyb, uEzb) = corners_up
    (dfa, dga, dExa, dEya, dEza,
     dfb, dgb, dExb, dEyb, dEzb) = corners_dn
    hfud = jnp.stack((pop_ud_slab(fu, ufa, ufb),
                      pop_ud_slab(fd, dfa, dfb)))       # (2,P,S,Q,1,2,NX)
    hgud = jnp.stack((pop_ud_slab(gu, uga, ugb),
                      pop_ud_slab(gd, dga, dgb)))
    hEud = jnp.stack((
        jnp.stack((fld_ud_slab(Exu, uExa, uExb),
                   fld_ud_slab(Eyu, uEya, uEyb),
                   fld_ud_slab(Ezu, uEza, uEzb))),
        jnp.stack((fld_ud_slab(Exd, dExa, dExb),
                   fld_ud_slab(Eyd, dEya, dEyb),
                   fld_ud_slab(Ezd, dEza, dEzb)))))     # (2,3,P,1,2,NX)

    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.maximum(jnp.minimum(k - jnp.int32(1), jnp.int32(nk - 1)),
                           jnp.int32(0))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.maximum(jnp.minimum(k - jnp.int32(2), jnp.int32(nk - 1)),
                           jnp.int32(0))

    def ud(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == 0, jnp.int32(0), jnp.int32(1))

    pop_in = pl.BlockSpec((S, Q, 1, ty, NX),
                          lambda p, k: (0, 0, in_band(k), p, 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, 1, ty, NX),
                           lambda p, k: (0, 0, out_band(k), p, 0),
                           memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((1, ty, NX), lambda p, k: (in_band(k), p, 0),
                          memory_space=pltpu.VMEM)
    halo_pop = pl.BlockSpec((1, S, Q, 1, 2, NX),
                            lambda p, k: (p, 0, 0, in_band(k), 0, 0),
                            memory_space=pltpu.VMEM)
    halo_fld = pl.BlockSpec((1, 1, 2, NX),
                            lambda p, k: (p, in_band(k), 0, 0),
                            memory_space=pltpu.VMEM)
    ud_pop = pl.BlockSpec((1, S, Q, 1, ty, NX),
                          lambda p, k: (ud(k), 0, 0, 0, p, 0),
                          memory_space=pltpu.VMEM)
    ud_slab = pl.BlockSpec((1, 1, S, Q, 1, 2, NX),
                           lambda p, k: (ud(k), p, 0, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    ud_fld = pl.BlockSpec((1, 3, 1, ty, NX),
                          lambda p, k: (ud(k), 0, 0, p, 0),
                          memory_space=pltpu.VMEM)
    ud_fld_slab = pl.BlockSpec((1, 3, 1, 1, 2, NX),
                               lambda p, k: (ud(k), 0, p, 0, 0, 0),
                               memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_panel_zhalo_kernel(params, ty, nk)

    dt = f.dtype
    bytes_pop = S * Q * NZ * NY * NX * dt.itemsize
    return pl.pallas_call(
        kernel,
        grid=(P, nk + 2),
        in_specs=[pop_in, pop_in, halo_pop, halo_pop,
                  fld_in, fld_in, fld_in,
                  halo_fld, halo_fld, halo_fld,
                  ud_pop, ud_pop, ud_slab, ud_slab, ud_fld, ud_fld_slab],
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
        ],
        # in-place HBM update: out slice j is written at grid step j+2,
        # one step after its input block was consumed (fetched at j+1)
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(6000 * NZ * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, hf, hg, Ex, Ey, Ez, hEx, hEy, hEz,
      fud, gud, hfud, hgud, Eud, hEud)
