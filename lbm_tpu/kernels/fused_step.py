"""Fully-fused collide+stream Pallas kernel (periodic BC).

One pass over HBM per step for the entire LBM pipeline except the Poisson
solve. The lattice is processed in full-width row bands:

  * collide: moments -> 18 equilibria -> triple-BGK + Guo + DDF thermal
    (the shared ops from lbm_tpu.ops), entirely in VMEM;
  * x-streaming: columns are periodic within a full-width band, so the
    shift is an in-VMEM roll applied when the post-collision planes are
    produced;
  * y-streaming: a software pipeline across grid steps. Streamed band b
    needs post-collision rows from bands b-1, b, b+1, so grid step k
    collides band k (as local values) and *assembles band k-1* from
    persistent VMEM scratch: the previous band's planes, the
    band-before-that's last row, and the current band's first row. Two
    epilogue grid steps close the periodic wrap (band nk-1 uses band 0's
    saved first rows; band 0 is re-collided and uses band nk-1's last row).

Everything uses regular blocked in/out specs (auto-pipelined by Mosaic); no
manual DMAs. Mosaic's 8-row sublane alignment is respected by keeping all
*ref* slices 8-row aligned (edge buffers hold 8-row chunks; the single rows
needed for the +-1 shifts are sliced from loaded *values*, where arbitrary
offsets are legal).

HBM traffic per simulation step: read f+g (+ one re-fetched band), write
f+g — the BASELINE.json north-star kernel ("BGK relaxation + electric
force + streaming in one pass, no intermediate lattice copy").
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
from ..ops.equilibrium import equilibrium_wpolys
from ..ops.macros import update_macro

_CX = [int(c) for c in D2Q9.CX]
_CY = [int(c) for c in D2Q9.CY]
_Q = D2Q9.Q
_S = 3

_DIRS_POS = [i for i in range(_Q) if _CY[i] == 1]    # 2, 5, 6
_DIRS_NEG = [i for i in range(_Q) if _CY[i] == -1]   # 4, 7, 8


def _roll_x(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Periodic column shift: out[x] = a[x - shift] (jnp.roll semantics)."""
    if shift == 0:
        return a
    return jnp.concatenate((a[..., -shift:], a[..., :-shift]), axis=-1)


def _cast_io(f, g):
    """bf16-storage mode: populations cross HBM in bf16, all arithmetic
    runs in f32 in-register. Returns (f32 values, store-dtype)."""
    dt_store = f.dtype
    if dt_store == jnp.bfloat16:
        return f.astype(jnp.float32), g.astype(jnp.float32), dt_store
    return f, g, None


def _store(plane, dt_store):
    return plane if dt_store is None else plane.astype(dt_store)


def _g_recip_for(dt_store):
    """bf16 mode runs the partial-fraction thermal term with the VPU's
    approximate reciprocal (~1.6e-5 rel — the scale of one bf16 storage
    rounding): the exact form's per-direction division chain is the single
    largest exposed-compute block once the DMA bytes are halved (measured
    0.80 ms of the 1.15 ms exposed at 2048^2). Native mode keeps the exact
    form — its rounding is part of the golden trajectory, and the f32
    kernel is DMA-bound anyway."""
    if dt_store is None:
        return None
    return lambda x: pl.reciprocal(x, approx=True)


def _make_kernel(params, ty, nk):
    def collide_band(f_ref, g_ref, ex_ref, ey_ref, rq_ref):
        """Collide the fetched band; returns per-species x-rolled planes."""
        Ex = ex_ref[:]
        Ey = ey_ref[:]
        f, g, dt_store = _cast_io(f_ref[:], g_ref[:])
        mac = update_macro(f, g, Ex, Ey,
                           q_e=params["q_e"], q_i=params["q_i"],
                           m_e=params["m_e"], m_i=params["m_i"],
                           neutral_ref=params["neutral_ref"])
        rq_ref[:] = mac.rho_q
        pair_polys = {
            p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p],
                                 params["cs2"])
            for p in range(3)
        }
        fv, gv = [], []
        for s in range(_S):
            f_dirs, g_dirs = collide_species_dirs(
                s, f[s], g[s], mac, Ex, Ey,
                taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
                m_e=params["m_e"], m_i=params["m_i"],
                cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys,
                neutral_ref=params["neutral_ref"],
                g_recip=_g_recip_for(dt_store))
            fv.append([_roll_x(_store(f_dirs[i], dt_store), _CX[i])
                       for i in range(_Q)])
            gv.append([_roll_x(_store(g_dirs[i], dt_store), _CX[i])
                       for i in range(_Q)])
        return fv, gv

    def assemble(out_ref, s, prev, last8, below_rows):
        """Write species s of the streamed band: F_i = [above]/P_b/[below].

        prev: scratch ref with P_b; last8: 8-row chunks whose row 7 is
        P_{b-1}'s last row; below_rows[gi]: (1, NX) value with P_{b+1}'s
        first row, per cy=-1 direction.
        """
        for i in range(_Q):
            cy = _CY[i]
            prev_i = prev[i, s]                       # (ty, NX) value
            if cy == 0:
                out_ref[s, i] = prev_i
            elif cy == 1:
                gi = _DIRS_POS.index(i)
                above = last8[gi, s, 7:8, :]          # (1, NX)
                out_ref[s, i] = jnp.concatenate(
                    (above, prev_i[: ty - 1]), axis=0)
            else:
                gi = _DIRS_NEG.index(i)
                out_ref[s, i] = jnp.concatenate(
                    (prev_i[1:], below_rows[gi]), axis=0)

    def kernel(f_ref, g_ref, ex_ref, ey_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, flast8, glast8, fb0, gb0, fb1, gb1):
        k = pl.program_id(0)

        # ---- main march: collide band k, assemble band k-1 ----
        @pl.when(k < nk)
        def _():
            fv, gv = collide_band(f_ref, g_ref, ex_ref, ey_ref, rq_ref)
            for s in range(_S):
                @pl.when(k >= 1)
                def _(s=s):
                    below_f = [fv[s][i][0:1] for i in _DIRS_NEG]
                    below_g = [gv[s][i][0:1] for i in _DIRS_NEG]
                    assemble(fo_ref, s, fprev, flast8, below_f)
                    assemble(go_ref, s, gprev, glast8, below_g)

                @pl.when(k == 0)
                def _(s=s):
                    # keep band 0's full post-collision planes for the final
                    # wrap assembly (the f/g buffers are aliased to the
                    # outputs, so band 0 cannot be re-fetched later)
                    for i in range(_Q):
                        fb0[i, s] = fv[s][i]
                        gb0[i, s] = gv[s][i]

                if nk > 1:
                    @pl.when(k == 1)
                    def _(s=s):
                        for gi, i in enumerate(_DIRS_NEG):
                            fb1[gi, s] = fv[s][i][0:8]
                            gb1[gi, s] = gv[s][i][0:8]

                # last8 <- prev's last rows, then prev <- current planes
                for gi, i in enumerate(_DIRS_POS):
                    flast8[gi, s] = fprev[i, s, ty - 8:, :]
                    glast8[gi, s] = gprev[i, s, ty - 8:, :]
                for i in range(_Q):
                    fprev[i, s] = fv[s][i]
                    gprev[i, s] = gv[s][i]

        # ---- epilogue 1 (k == nk): band nk-1; below row is band 0's ----
        @pl.when(k == nk)
        def _():
            for s in range(_S):
                below_f = [fb0[i, s, 0:1, :] for i in _DIRS_NEG]
                below_g = [gb0[i, s, 0:1, :] for i in _DIRS_NEG]
                assemble(fo_ref, s, fprev, flast8, below_f)
                assemble(go_ref, s, gprev, glast8, below_g)

        # ---- epilogue 2 (k == nk+1): band 0 from its saved planes; above
        # row is band nk-1's last row (= prev, untouched by epilogue 1) ----
        @pl.when(k == nk + 1)
        def _():
            for s in range(_S):
                for i in range(_Q):
                    cy = _CY[i]
                    if cy == 0:
                        fo_ref[s, i] = fb0[i, s]
                        go_ref[s, i] = gb0[i, s]
                    elif cy == 1:
                        fo_ref[s, i] = jnp.concatenate(
                            (fprev[i, s, ty - 1: ty, :], fb0[i, s, : ty - 1]),
                            axis=0)
                        go_ref[s, i] = jnp.concatenate(
                            (gprev[i, s, ty - 1: ty, :], gb0[i, s, : ty - 1]),
                            axis=0)
                    else:
                        gi = _DIRS_NEG.index(i)
                        if nk == 1:
                            below_f = fb0[i, s, 0:1, :]
                            below_g = gb0[i, s, 0:1, :]
                        else:
                            below_f = fb1[gi, s, 0:1, :]
                            below_g = gb1[gi, s, 0:1, :]
                        fo_ref[s, i] = jnp.concatenate(
                            (fb0[i, s, 1:], below_f), axis=0)
                        go_ref[s, i] = jnp.concatenate(
                            (gb0[i, s, 1:], below_g), axis=0)

    return kernel


def _make_halo_kernel(params, ty, nk):
    """Kernel variant for sharded (non-wrapping) domains.

    The y-neighbors' rows arrive as explicit halo inputs (pre-collision
    8-row strips exchanged over ICI by the shard_map wrapper) and are
    collided redundantly in-kernel, so no periodic-wrap epilogue bands are
    needed: grid = nk + 1.

      k == 0:        collide the upper halo strip -> last8 scratch;
                     collide band 0 -> prev.
      k in [1, nk):  collide band k; assemble band k-1.
      k == nk:       collide the lower halo strip; assemble band nk-1
                     with its first row as the "below" row.
    """
    def collide_strip(f, g, Ex, Ey):
        """Collide an (S, Q, rows, NX) strip held as values; returns
        x-rolled per-species plane lists."""
        f, g, dt_store = _cast_io(f, g)
        mac = update_macro(f, g, Ex, Ey,
                           q_e=params["q_e"], q_i=params["q_i"],
                           m_e=params["m_e"], m_i=params["m_i"],
                           neutral_ref=params["neutral_ref"])
        pair_polys = {
            p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p],
                                 params["cs2"])
            for p in range(3)
        }
        fv, gv, = [], []
        for s in range(_S):
            f_dirs, g_dirs = collide_species_dirs(
                s, f[s], g[s], mac, Ex, Ey,
                taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
                m_e=params["m_e"], m_i=params["m_i"],
                cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys,
                neutral_ref=params["neutral_ref"],
                g_recip=_g_recip_for(dt_store))
            fv.append([_roll_x(_store(f_dirs[i], dt_store), _CX[i])
                       for i in range(_Q)])
            gv.append([_roll_x(_store(g_dirs[i], dt_store), _CX[i])
                       for i in range(_Q)])
        return fv, gv, mac

    def assemble(out_ref, s, prev, last8, below_rows, ty):
        for i in range(_Q):
            cy = _CY[i]
            prev_i = prev[i, s]
            if cy == 0:
                out_ref[s, i] = prev_i
            elif cy == 1:
                gi = _DIRS_POS.index(i)
                above = last8[gi, s, 7:8, :]
                out_ref[s, i] = jnp.concatenate(
                    (above, prev_i[: ty - 1]), axis=0)
            else:
                gi = _DIRS_NEG.index(i)
                out_ref[s, i] = jnp.concatenate(
                    (prev_i[1:], below_rows[gi]), axis=0)

    def kernel(f_ref, g_ref, ex_ref, ey_ref,
               fup_ref, gup_ref, eup_x, eup_y,      # upper halo strips
               fdn_ref, gdn_ref, edn_x, edn_y,      # lower halo strips
               fo_ref, go_ref, rq_ref,
               fprev, gprev, flast8, glast8):
        k = pl.program_id(0)

        @pl.when(k < nk)
        def _():
            # at k == 0, collide the upper halo and seed last8 with it
            @pl.when(k == 0)
            def _():
                fvh, gvh, _ = collide_strip(fup_ref[:], gup_ref[:],
                                            eup_x[:], eup_y[:])
                for s in range(_S):
                    for gi, i in enumerate(_DIRS_POS):
                        flast8[gi, s] = fvh[s][i]
                        glast8[gi, s] = gvh[s][i]

            fv, gv, mac = collide_strip(f_ref[:], g_ref[:],
                                        ex_ref[:], ey_ref[:])
            rq_ref[:] = mac.rho_q
            for s in range(_S):
                @pl.when(k >= 1)
                def _(s=s):
                    below_f = [fv[s][i][0:1] for i in _DIRS_NEG]
                    below_g = [gv[s][i][0:1] for i in _DIRS_NEG]
                    assemble(fo_ref, s, fprev, flast8, below_f, ty)
                    assemble(go_ref, s, gprev, glast8, below_g, ty)

                @pl.when(k >= 1)
                def _(s=s):
                    for gi, i in enumerate(_DIRS_POS):
                        flast8[gi, s] = fprev[i, s, ty - 8:, :]
                        glast8[gi, s] = gprev[i, s, ty - 8:, :]
                for i in range(_Q):
                    fprev[i, s] = fv[s][i]
                    gprev[i, s] = gv[s][i]

        @pl.when(k == nk)
        def _():
            fvh, gvh, _ = collide_strip(fdn_ref[:], gdn_ref[:],
                                        edn_x[:], edn_y[:])
            for s in range(_S):
                below_f = [fvh[s][i][0:1] for i in _DIRS_NEG]
                below_g = [gvh[s][i][0:1] for i in _DIRS_NEG]
                assemble(fo_ref, s, fprev, flast8, below_f, ty)
                assemble(go_ref, s, gprev, glast8, below_g, ty)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "band", "neutral_ref"),
)
def collide_stream_halo(
    f: jnp.ndarray,       # (3, Q, NYl, NX) local shard
    g: jnp.ndarray,
    Ex: jnp.ndarray,      # (NYl, NX)
    Ey: jnp.ndarray,
    f_up: jnp.ndarray,    # (3, Q, 8, NX) pre-collision strip from above
    g_up: jnp.ndarray,
    Ex_up: jnp.ndarray,   # (8, NX)
    Ey_up: jnp.ndarray,
    f_dn: jnp.ndarray,    # (3, Q, 8, NX) strip from below
    g_dn: jnp.ndarray,
    Ex_dn: jnp.ndarray,
    Ey_dn: jnp.ndarray,
    *,
    taus: Tuple[float, ...],
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    band: int = 0,
    neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused collide+stream for one y-shard with explicit halo strips.

    The upper halo strip must be the 8 rows immediately above the shard
    (i.e. the up-neighbor's last 8 rows; only its last row is used) and the
    lower strip the 8 rows below (only its first row used). Ex/Ey strips
    carry the field at those rows. Returns (f_new, g_new, rho_q) for the
    local shard.
    """
    S, Q, NY, NX = f.shape
    ty = band or _pick_band(NY, NX, f.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"band height {ty} invalid for NY={NY}")
    nk = NY // ty
    grid = (nk + 1,)

    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk, jnp.int32(nk - 1),
                 jnp.maximum(k - jnp.int32(1), jnp.int32(0)))

    pop_in = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    halo_pop = pl.BlockSpec((S, Q, 8, NX), lambda k: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    halo_fld = pl.BlockSpec((8, NX), lambda k: (0, 0),
                            memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_halo_kernel(params, ty, nk)
    dt = f.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, pop_in, fld_in, fld_in,
                  halo_pop, halo_pop, halo_fld, halo_fld,
                  halo_pop, halo_pop, halo_fld, halo_fld],
        out_specs=(pop_out, pop_out, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((_Q, _S, ty, NX), dt),
            pltpu.VMEM((_Q, _S, ty, NX), dt),
            pltpu.VMEM((3, _S, 8, NX), dt),
            pltpu.VMEM((3, _S, 8, NX), dt),
        ],
        # in-place HBM update (no wrap refetch exists in the halo variant;
        # out band b is written after its input was consumed)
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(3000 * NY * NX),
            bytes_accessed=4 * S * Q * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex, Ey, f_up, g_up, Ex_up, Ey_up, f_dn, g_dn, Ex_dn, Ey_dn)


def _make_halo2d_kernel(params, ty, nk, nxl):
    """Kernel for 2-D (row AND column) sharded domains.

    Like the 1-D halo kernel, but the x-streaming wrap columns come from
    8-column strips exchanged with the x-neighbors (collided redundantly per
    band), and the y-halo strips arrive corner-extended to width NXl+16 so
    their rows can be x-shifted by +-1 without wrap logic.
    """
    def collide_strip(f, g, Ex, Ey):
        """Collide a strip held as values; returns UNROLLED per-species
        plane lists plus the macros."""
        f, g, dt_store = _cast_io(f, g)
        mac = update_macro(f, g, Ex, Ey,
                           q_e=params["q_e"], q_i=params["q_i"],
                           m_e=params["m_e"], m_i=params["m_i"],
                           neutral_ref=params["neutral_ref"])
        pair_polys = {
            p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p],
                                 params["cs2"])
            for p in range(3)
        }
        fv, gv = [], []
        for s in range(_S):
            f_dirs, g_dirs = collide_species_dirs(
                s, f[s], g[s], mac, Ex, Ey,
                taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
                m_e=params["m_e"], m_i=params["m_i"],
                cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys,
                neutral_ref=params["neutral_ref"],
                g_recip=_g_recip_for(dt_store))
            fv.append([_store(d, dt_store) for d in f_dirs])
            gv.append([_store(d, dt_store) for d in g_dirs])
        return fv, gv, mac

    def roll_with_neighbors(p, p_lt, p_rt, cx):
        """x-shift using the x-neighbor strips' edge columns."""
        if cx == 0:
            return p
        if cx == 1:   # new[x] = P[x-1]; x=0 takes the left strip's last col
            return jnp.concatenate((p_lt[:, 7:8], p[:, : nxl - 1]), axis=1)
        return jnp.concatenate((p[:, 1:], p_rt[:, 0:1]), axis=1)

    def ext_row(plane_ext, row, cx):
        """Row `row` of a corner-extended (8, NXl+16) plane, x-shifted by
        cx: content[x] = plane[row, 8 + x - cx]."""
        return plane_ext[row: row + 1, 8 - cx: 8 - cx + nxl]

    def assemble(out_ref, s, prev, last8, below_rows):
        for i in range(_Q):
            cy = _CY[i]
            prev_i = prev[i, s]
            if cy == 0:
                out_ref[s, i] = prev_i
            elif cy == 1:
                gi = _DIRS_POS.index(i)
                above = last8[gi, s, 7:8, :]
                out_ref[s, i] = jnp.concatenate(
                    (above, prev_i[: ty - 1]), axis=0)
            else:
                gi = _DIRS_NEG.index(i)
                out_ref[s, i] = jnp.concatenate(
                    (prev_i[1:], below_rows[gi]), axis=0)

    def kernel(f_ref, g_ref, ex_ref, ey_ref,
               fup_ref, gup_ref, exup_ref, eyup_ref,
               fdn_ref, gdn_ref, exdn_ref, eydn_ref,
               flt_ref, glt_ref, exlt_ref, eylt_ref,
               frt_ref, grt_ref, exrt_ref, eyrt_ref,
               fo_ref, go_ref, rq_ref,
               fprev, gprev, flast8, glast8):
        k = pl.program_id(0)

        @pl.when(k < nk)
        def _():
            # seed last8 from the corner-extended up strip at the first band
            @pl.when(k == 0)
            def _():
                fvu, gvu, _ = collide_strip(fup_ref[:], gup_ref[:],
                                            exup_ref[:], eyup_ref[:])
                for s in range(_S):
                    for gi, i in enumerate(_DIRS_POS):
                        # stored pre-shifted so row 7 is directly usable
                        flast8[gi, s] = jnp.concatenate(
                            [ext_row(fvu[s][i], r, _CX[i]) for r in range(8)],
                            axis=0)
                        glast8[gi, s] = jnp.concatenate(
                            [ext_row(gvu[s][i], r, _CX[i]) for r in range(8)],
                            axis=0)

            fv, gv, mac = collide_strip(f_ref[:], g_ref[:],
                                        ex_ref[:], ey_ref[:])
            rq_ref[:] = mac.rho_q
            fvl, gvl, _ = collide_strip(flt_ref[:], glt_ref[:],
                                        exlt_ref[:], eylt_ref[:])
            fvr, gvr, _ = collide_strip(frt_ref[:], grt_ref[:],
                                        exrt_ref[:], eyrt_ref[:])
            frolled = [[roll_with_neighbors(fv[s][i], fvl[s][i], fvr[s][i],
                                            _CX[i]) for i in range(_Q)]
                       for s in range(_S)]
            grolled = [[roll_with_neighbors(gv[s][i], gvl[s][i], gvr[s][i],
                                            _CX[i]) for i in range(_Q)]
                       for s in range(_S)]
            for s in range(_S):
                @pl.when(k >= 1)
                def _(s=s):
                    below_f = [frolled[s][i][0:1] for i in _DIRS_NEG]
                    below_g = [grolled[s][i][0:1] for i in _DIRS_NEG]
                    assemble(fo_ref, s, fprev, flast8, below_f)
                    assemble(go_ref, s, gprev, glast8, below_g)

                @pl.when(k >= 1)
                def _(s=s):
                    for gi, i in enumerate(_DIRS_POS):
                        flast8[gi, s] = fprev[i, s, ty - 8:, :]
                        glast8[gi, s] = gprev[i, s, ty - 8:, :]
                for i in range(_Q):
                    fprev[i, s] = frolled[s][i]
                    gprev[i, s] = grolled[s][i]

        @pl.when(k == nk)
        def _():
            fvd, gvd, _ = collide_strip(fdn_ref[:], gdn_ref[:],
                                        exdn_ref[:], eydn_ref[:])
            for s in range(_S):
                below_f = [ext_row(fvd[s][i], 0, _CX[i]) for i in _DIRS_NEG]
                below_g = [ext_row(gvd[s][i], 0, _CX[i]) for i in _DIRS_NEG]
                assemble(fo_ref, s, fprev, flast8, below_f)
                assemble(go_ref, s, gprev, glast8, below_g)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "band", "neutral_ref"),
)
def collide_stream_halo2d(
    f, g, Ex, Ey,                  # local shard (3, Q, NYl, NXl) / (NYl, NXl)
    f_up, g_up, Ex_up, Ey_up,      # corner-extended (.., 8, NXl+16) strips
    f_dn, g_dn, Ex_dn, Ey_dn,
    f_lt, g_lt, Ex_lt, Ey_lt,      # x-neighbor strips (.., NYl, 8)
    f_rt, g_rt, Ex_rt, Ey_rt,
    *,
    taus, q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    interpret: bool = False,
    band: int = 0,
    neutral_ref: float = 0.0,
):
    """Fused collide+stream for one (y, x)-shard with explicit halos.

    f_up/f_dn: the 8 rows above/below the shard, corner-extended by 8
    columns on each side (so only their row 7 / row 0 are consumed, already
    x-shiftable). f_lt/f_rt: the 8 columns left/right of the shard (only
    their column 7 / column 0 are consumed). Returns (f_new, g_new, rho_q).
    """
    S, Q, NY, NX = f.shape
    ty = band or _pick_band(NY, NX, f.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"band height {ty} invalid for NY={NY}")
    nk = NY // ty
    grid = (nk + 1,)

    def in_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk, jnp.int32(nk - 1),
                 jnp.maximum(k - jnp.int32(1), jnp.int32(0)))

    pop_in = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    ypop = pl.BlockSpec((S, Q, 8, NX + 16), lambda k: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    yfld = pl.BlockSpec((8, NX + 16), lambda k: (0, 0),
                        memory_space=pltpu.VMEM)
    xpop = pl.BlockSpec((S, Q, ty, 8), lambda k: (0, 0, in_band(k), 0),
                        memory_space=pltpu.VMEM)
    xfld = pl.BlockSpec((ty, 8), lambda k: (in_band(k), 0),
                        memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_halo2d_kernel(params, ty, nk, NX)
    dt = f.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, pop_in, fld_in, fld_in,
                  ypop, ypop, yfld, yfld,
                  ypop, ypop, yfld, yfld,
                  xpop, xpop, xfld, xfld,
                  xpop, xpop, xfld, xfld],
        out_specs=(pop_out, pop_out, fld_in),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((_Q, _S, ty, NX), dt),
            pltpu.VMEM((_Q, _S, ty, NX), dt),
            pltpu.VMEM((3, _S, 8, NX), dt),
            pltpu.VMEM((3, _S, 8, NX), dt),
        ],
        # in-place HBM update (halo variants have no wrap refetch)
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(3200 * NY * NX),
            bytes_accessed=4 * S * Q * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex, Ey,
      f_up, g_up, Ex_up, Ey_up, f_dn, g_dn, Ex_dn, Ey_dn,
      f_lt, g_lt, Ex_lt, Ey_lt, f_rt, g_rt, Ex_rt, Ey_rt)


def _pick_band(NY: int, NX: int, itemsize: int) -> int:
    """Band height whose working set fits the (raised) VMEM budget.

    v5e exposes far more VMEM than the 16 MB default scoped limit; the
    kernels set vmem_limit_bytes=100MB, which admits full-width bands up to
    NX=4096 (measured 1123 MLUPS single-chip there). ty=8 is preferred —
    taller bands showed no speedup and smaller footprints pipeline better.
    """
    for ty in (8, 16, 32):
        if NY % ty:
            continue
        vmem = (
            (2 + 2) * 2 * _S * _Q * ty * NX * itemsize   # in/out x2 buffers
            + (2 + 2) * _S * _Q * ty * NX * itemsize      # prev + b0 planes
            + 6 * 3 * _S * 8 * NX * itemsize              # edge chunks
            # live temporaries are COMPUTE-dtype (f32 when storage is
            # bf16), not storage-dtype
            + 80 * ty * NX * max(itemsize, 4)
        )
        if vmem < 90 * 1024 * 1024:
            return ty
    raise ValueError(f"no feasible band height for {NY}x{NX} grid")


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "interpret", "band", "neutral_ref"),
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
    neutral_ref: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(f_streamed, g_streamed, rho_q) in one fused pass. Periodic BC."""
    S, Q, NY, NX = f.shape
    ty = band or _pick_band(NY, NX, f.dtype.itemsize)
    if ty < 8 or NY % ty:
        raise ValueError(f"band height {ty} invalid for NY={NY}")
    nk = NY // ty
    grid = (nk + 2,)

    def in_band(k):
        # bands 0..nk-1; the epilogue steps fetch nothing new (clamped).
        # With the outputs aliased onto f/g, band 0 must NOT be re-read
        # after its output block has been flushed — band 0's wrap assembly
        # uses its planes saved in scratch instead.
        k = jnp.asarray(k, jnp.int32)
        return jnp.minimum(k, jnp.int32(nk - 1))

    def out_band(k):
        # 0 (placeholder), bands 0..nk-2, band nk-1, band 0 (final)
        k = jnp.asarray(k, jnp.int32)
        return jnp.where(k == nk + 1, jnp.int32(0),
                 jnp.where(k == nk, jnp.int32(nk - 1),
                           jnp.maximum(k - jnp.int32(1), jnp.int32(0))))

    pop_in = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((S, Q, ty, NX), lambda k: (0, 0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    fld_rq = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)

    params = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_kernel(params, ty, nk)

    dt = f.dtype
    bytes_pop = S * Q * NY * NX * f.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, pop_in, fld_in, fld_in],
        out_specs=(pop_out, pop_out, fld_rq),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(g.shape, dt),
            jax.ShapeDtypeStruct(Ex.shape, Ex.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, S, ty, NX), dt),   # fprev
            pltpu.VMEM((Q, S, ty, NX), dt),   # gprev
            pltpu.VMEM((3, S, 8, NX), dt),    # flast8
            pltpu.VMEM((3, S, 8, NX), dt),    # glast8
            pltpu.VMEM((Q, S, ty, NX), dt),   # fb0 (band-0 planes)
            pltpu.VMEM((Q, S, ty, NX), dt),   # gb0
            pltpu.VMEM((3, S, 8, NX), dt),    # fb1
            pltpu.VMEM((3, S, 8, NX), dt),    # gb1
        ],
        # aliasing f->f_new and g->g_new makes the step in-place in HBM;
        # measured 1.46x on the DMA-bound pipeline. Write-after-read is
        # safe: out band b is written at grid step b+1 and flushed at b+2,
        # after its input was consumed at step b.
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(3000 * NY * NX),
            bytes_accessed=4 * bytes_pop,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex, Ey)
