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
is handled like the 2-D bounce-back handles walls — by EDGE FIXUPS
OUTSIDE the kernel: each panel collides exactly its own ty rows (zero
redundant compute, no halo inputs), the in-kernel y-roll wraps within the
panel (wrong only at the 2 boundary rows of each panel for the 10
cy = +-1 directions), and the kernel additionally writes each panel's
post-collision FIRST row (cy = -1 directions) and LAST row (cy = +1) to
tiny side outputs. The XLA-side fixup then views f as
(S, Q, NZ, P, ty, NX) — a free reshape — and overwrites row 0 / row ty-1
of every panel with the neighbor panel's exported row, z/x-rolled per the
direction (jnp.roll moves no one's bits, so the bf16 f-bitwise contract
holds). Cost: one packed export of (S, NZ, P, 20, NX) rows (~0.4% of the
population bytes at ty = 64) plus a boundary-row scatter — vs the
round-3-v1 design's 8-row redundant halo strips (+25% reads, +25%
collide, 114 in-kernel concatenates), which measured 4.2x off the DMA
floor at 512^2 x 64.

In-place HBM update via input_output_aliases: panel p's outputs are
written behind its own reads (same argument as the single kernel), and
panels never read outside their own rows.
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
    def collide_panel(f_ref, g_ref, ex_ref, ey_ref, ez_ref, rq_ref, eo_ref):
        """Collide the (ty, NX) panel slice; export its boundary rows;
        return (y, x)-rolled plane lists (panel-local wrap in y)."""
        Ex, Ey, Ez = ex_ref[0], ey_ref[0], ez_ref[0]
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
            # post-collision pre-roll boundary rows for the XLA-side fixup,
            # packed as one aligned (20, NX) block write: rows 0-4 f last
            # row (cy=+1 dirs), 5-9 f first row (cy=-1), 10-19 same for g
            eo_ref[s, 0, 0] = jnp.concatenate(
                [f_dirs[i][ty - 1:ty] for i in _DIRS_YPOS]
                + [f_dirs[i][0:1] for i in _DIRS_YNEG]
                + [g_dirs[i][ty - 1:ty] for i in _DIRS_YPOS]
                + [g_dirs[i][0:1] for i in _DIRS_YNEG], axis=0)
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
               fo_ref, go_ref, rq_ref, eo_ref,
               fprev, gprev, fzlast, gzlast, fb0, gb0, fb1, gb1):
        k = pl.program_id(1)   # z index (innermost); panel p = program_id(0)

        @pl.when(k < nk)
        def _():
            fv, gv = collide_panel(f_ref, g_ref, ex_ref, ey_ref, ez_ref,
                                   rq_ref, eo_ref)
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


def _fix_panel_edges(a, edges, row0, ty):
    """Overwrite every panel's boundary rows with the neighbor panel's
    exported post-collision row, streamed per direction.

    a: (S, Q, NZ, NY, NX) kernel output whose y-roll wrapped panel-locally;
    edges: (S, NZ, P, 20, NX) packed exports — rows row0+j = dir
    _DIRS_YPOS[j]'s LAST panel row, rows row0+5+j = dir _DIRS_YNEG[j]'s
    FIRST row (row0 selects the f or g half). The streamed value at a
    panel's first row for cy = +1 is fpost[z - cz, p*ty - 1, x - cx] = the
    (p-1)-panel's exported last row, rolled by (cz, 1, cx) over (z, p, x).
    """
    S, Q, NZ, NY, NX = a.shape
    P = NY // ty
    ar = a.reshape(S, Q, NZ, P, ty, NX)
    for j, i in enumerate(_DIRS_YPOS):
        src = edges[:, :, :, row0 + j]              # (S, NZ, P, NX)
        src = jnp.roll(src, _CZ[i], axis=1) if _CZ[i] else src
        src = jnp.roll(src, 1, axis=2)
        src = jnp.roll(src, _CX[i], axis=3) if _CX[i] else src
        ar = ar.at[:, i, :, :, 0, :].set(src)
    for j, i in enumerate(_DIRS_YNEG):
        src = edges[:, :, :, row0 + 5 + j]
        src = jnp.roll(src, _CZ[i], axis=1) if _CZ[i] else src
        src = jnp.roll(src, -1, axis=2)
        src = jnp.roll(src, _CX[i], axis=3) if _CX[i] else src
        ar = ar.at[:, i, :, :, ty - 1, :].set(src)
    return ar.reshape(S, Q, NZ, NY, NX)


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
            # packed boundary-row export block, double-buffered
            + 2 * _S * 20 * NX * itemsize
            # live collide temporaries are COMPUTE-dtype (f32 under bf16)
            + 200 * ty * NX * max(itemsize, 4)
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
    # the packed-rows dim is written as a FULL block (Mosaic requires the
    # second-minor block dim to divide by 8 or span the array dim)
    edge_out = pl.BlockSpec((S, 1, 1, 20, NX),
                            lambda p, k: (0, in_band(k), p, 0, 0),
                            memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_panel_kernel(params, ty, nk)

    dt = f.dtype
    bytes_pop = S * Q * NZ * NY * NX * dt.itemsize
    f_n, g_n, rq, edges = pl.pallas_call(
        kernel,
        grid=(P, nk + 2),
        in_specs=[pop_in, pop_in, fld_in, fld_in, fld_in],
        out_specs=(pop_out, pop_out, fld_in, edge_out),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
            jax.ShapeDtypeStruct((S, NZ, P, 20, NX), dt),
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
        # in-place HBM update: panels read only their own rows and each
        # out slice is written one grid step after its input was consumed
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(6000 * NZ * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex, Ey, Ez)
    f_n = _fix_panel_edges(f_n, edges, 0, ty)
    g_n = _fix_panel_edges(g_n, edges, 10, ty)
    return f_n, g_n, rq
