"""Fully-fused cavity step Pallas kernel: collide + pull-stream + BCs +
guarded macros in ONE pass over HBM.

The classic solver (reference: old codes/LBM_classic/LBM.cpp:43-159) runs
three sweeps per step (collide, stream+BC, macro update) over separate
buffers. Here the whole step is one HBM round trip: read f and the stored
macros, write the streamed f and the new macros, all in-place
(input/output aliased). 2*(9+3) planes = 96 B/site in f32 — against the
plasma kernel's 432 — so the cavity step runs far above the plasma
roofline on the same chip.

Structure (same band software-pipeline as fused_step.py, but simpler —
the cavity never wraps):

  * pull streaming with displacement -c equals PUSH streaming with +c, so
    the in-register x-roll + cross-band y-shift machinery of the plasma
    kernel applies unchanged (reference pull loop: LBM.cpp:105-118);
  * every row/column the periodic roll gets wrong at the walls is exactly
    the set the cavity BCs overwrite: left wall fixes the three cx=+1
    populations at x=0, right wall the cx=-1 ones, bottom wall the cy=+1
    ones at y=0, and the moving lid the cy=-1 ones at y=NY-1 — so a
    periodic band pipeline plus static edge fixups reproduces the
    reference's wall handling bit-for-bit (write order sides -> bottom ->
    top encodes the corner winners, LBM.cpp:120-159);
  * the wall sources are all PRE-streaming post-collision values on the
    wall itself, which the x-rolled planes already hold at their wrap
    columns (e.g. f'[3][y,0] = rolled3[y,NX-1]) — no extra state;
  * the guarded macro update (LBM.cpp:74-88) runs on the assembled band
    before it is written, so rho/ux/uy cost one extra output plane each
    instead of a second pass.

Physics formulas are imported from lbm_tpu.ops.cavity and shared verbatim
with the jnp path (models/cavity.py) — the two backends are bitwise
identical by construction.

Grid: nk+1 steps over ty-row bands (k collides band k, assembles band
k-1; the final step assembles band nk-1, whose missing "below" rows are
placeholders that the lid fixup overwrites).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.cavity import (CX, CY, Q, W, collide_dirs, lid_deltas,
                          macros_guarded, sum_dirs)

_DIRS_POS = [i for i in range(Q) if CY[i] == 1]    # 2, 5, 6
_DIRS_NEG = [i for i in range(Q) if CY[i] == -1]   # 4, 7, 8


def _decode_dir(plane, i):
    """Full population from its storage form. bf16 storage holds f as
    bfloat16 deviations from the uniform background w_i (exactly invariant
    under cavity streaming + bounce-back: w5=w7, w6=w8); all arithmetic
    runs in f32 (CavityConfig.storage, models/cavity.decode_f)."""
    if plane.dtype == jnp.bfloat16:
        return plane.astype(jnp.float32) + W[i]
    return plane


def _encode_dir(plane, i, dt_store):
    """Storage form of a full population — the step's single lossy
    rounding in bf16 mode (models/cavity.encode_f)."""
    if dt_store == jnp.bfloat16:
        return (plane - W[i]).astype(jnp.bfloat16)
    return plane


def _roll_x(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Periodic column shift: out[x] = a[x - shift] (jnp.roll semantics)."""
    if shift == 0:
        return a
    return jnp.concatenate((a[..., -shift:], a[..., :-shift]), axis=-1)


def _make_emit(ty: int, nk: int, dt_store=None):
    def emit(k, below_rows, ulid_row,
             fo_ref, rho_o, ux_o, uy_o, prev, last8,
             bflag_row=None, tflag_row=None):
        """Assemble the band streamed at grid step k (= band k-1), apply
        the wall/lid fixups, compute its macros, write everything.

        bflag_row/tflag_row: None when this kernel owns the global
        bottom/top wall (single device); in the sharded halo variant they
        are (1, NX) 0/1 rows gating the bottom-wall and lid fixups to the
        shards that actually hold those walls."""
        pv = [prev[i] for i in range(Q)]

        # interior y-assembly (periodic x already applied in pv)
        out = []
        for i in range(Q):
            cy = CY[i]
            if cy == 0:
                out.append(pv[i])
            elif cy == 1:
                gi = _DIRS_POS.index(i)
                out.append(jnp.concatenate(
                    (last8[gi, 7:8, :], pv[i][: ty - 1]), axis=0))
            else:
                gi = _DIRS_NEG.index(i)
                out.append(jnp.concatenate(
                    (pv[i][1:], below_rows[gi]), axis=0))

        # side walls (all bands). The pre-streaming wall values live at the
        # x-rolled planes' wrap columns: f'[i][y, 0] = pv[i][y, -1] for
        # cx=-1 populations, f'[i][y, -1] = pv[i][y, 0] for cx=+1.
        def set_col0(a, col):
            return jnp.concatenate((col, a[:, 1:]), axis=1)

        def set_colN(a, col):
            return jnp.concatenate((a[:, :-1], col), axis=1)

        out[1] = set_col0(out[1], pv[3][:, -1:])   # LBM.cpp left wall
        out[8] = set_col0(out[8], pv[6][:, -1:])
        out[5] = set_col0(out[5], pv[7][:, -1:])
        out[3] = set_colN(out[3], pv[1][:, :1])    # right wall
        out[7] = set_colN(out[7], pv[5][:, :1])
        out[6] = set_colN(out[6], pv[8][:, :1])

        iota = jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)

        # bottom wall: band 0 only (assembled at k == 1); overwrites the
        # three cy=+1 populations' row 0 — exactly the rows whose interior
        # assembly above used undefined "above" values.
        def unroll_row(i, row):
            """Pre-streaming row of population i recovered from its
            x-rolled plane row: f'[i][r, x] = rolled[i][r, x + cx_i]."""
            return _roll_x(row, -CX[i])

        is_b = jnp.logical_and(k == 1, iota == 0)
        if bflag_row is not None:
            is_b = jnp.logical_and(is_b, bflag_row > 0)
        out[2] = jnp.where(is_b, pv[4][0:1], out[2])
        out[5] = jnp.where(is_b, unroll_row(7, pv[7][0:1]), out[5])
        out[6] = jnp.where(is_b, unroll_row(8, pv[8][0:1]), out[6])

        # moving lid: band nk-1 only (assembled at k == nk); written after
        # the walls so the lid wins the two top corners (LBM.cpp:146-159).
        top = [unroll_row(i, pv[i][ty - 1: ty]) for i in range(Q)]
        rho_top = sum_dirs(top)
        d5, d6 = lid_deltas(rho_top, ulid_row)
        is_t = jnp.logical_and(k == nk, iota == ty - 1)
        if tflag_row is not None:
            is_t = jnp.logical_and(is_t, tflag_row > 0)
        out[4] = jnp.where(is_t, top[2], out[4])
        out[7] = jnp.where(is_t, top[5] + d5, out[7])
        out[8] = jnp.where(is_t, top[6] + d6, out[8])

        for i in range(Q):
            fo_ref[i] = _encode_dir(out[i], i, dt_store)
        if rho_o is not None:  # lean mode: macros are never materialized
            rho, ux, uy = macros_guarded(out)
            rho_o[:] = rho
            ux_o[:] = ux
            uy_o[:] = uy

    return emit


def _make_kernel(tau: float, ty: int, nk: int, dt_store=None):
    emit = _make_emit(ty, nk, dt_store)

    def kernel(f_ref, rho_ref, ux_ref, uy_ref, ulid_ref,
               fo_ref, rho_o, ux_o, uy_o,
               prev, last8):
        k = pl.program_id(0)
        ulid_row = ulid_ref[0:1, :]

        @pl.when(k < nk)
        def _():
            fd = collide_dirs([_decode_dir(f_ref[i], i) for i in range(Q)],
                              rho_ref[:], ux_ref[:], uy_ref[:], tau)
            fv = [_roll_x(fd[i], CX[i]) for i in range(Q)]

            @pl.when(k >= 1)
            def _():
                below = [fv[i][0:1] for i in _DIRS_NEG]
                emit(k, below, ulid_row,
                     fo_ref, rho_o, ux_o, uy_o, prev, last8)
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi] = prev[i, ty - 8:, :]

            for i in range(Q):
                prev[i] = fv[i]

        @pl.when(k == nk)
        def _():
            # placeholder below rows: the lid fixup overwrites every cy=-1
            # population's last row, so any defined value works
            below = [prev[i, ty - 1:, :] for i in _DIRS_NEG]
            emit(k, below, ulid_row,
                 fo_ref, rho_o, ux_o, uy_o, prev, last8)

    return kernel


def _make_lean_kernel(tau: float, ty: int, nk: int, dt_store=None):
    """Lean variant: the stored macros are mathematically redundant
    (always macros_guarded(f) by the step recurrence), so this kernel
    RECOMPUTES them in-register at collide time and traffics only the
    populations — 18 planes instead of 24 (f32: 72 B/site; bf16 delta:
    36). In f32 this computes the exact same mathematical function as the
    stored-macro kernel (the init state's analytic rho=1 equals the
    sequential w-sum exactly in f32) — trajectories agree to the usual
    cross-program fusion-context ulp; in f64 the init differs by one ulp
    besides. In bf16 the recomputed
    macros come from the ROUNDED deltas instead of the pre-rounding f32
    planes — measured Ghia 128^2/10k: u 5.5% vs 2.5% (docs/STATUS.md) —
    so bf16+lean is a documented accuracy trade."""
    emit = _make_emit(ty, nk, dt_store)

    def kernel(f_ref, ulid_ref, fo_ref, prev, last8):
        k = pl.program_id(0)
        ulid_row = ulid_ref[0:1, :]

        @pl.when(k < nk)
        def _():
            fdec = [_decode_dir(f_ref[i], i) for i in range(Q)]
            rho, ux, uy = macros_guarded(fdec)
            fd = collide_dirs(fdec, rho, ux, uy, tau)
            fv = [_roll_x(fd[i], CX[i]) for i in range(Q)]

            @pl.when(k >= 1)
            def _():
                below = [fv[i][0:1] for i in _DIRS_NEG]
                emit(k, below, ulid_row, fo_ref, None, None, None,
                     prev, last8)
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi] = prev[i, ty - 8:, :]

            for i in range(Q):
                prev[i] = fv[i]

        @pl.when(k == nk)
        def _():
            below = [prev[i, ty - 1:, :] for i in _DIRS_NEG]
            emit(k, below, ulid_row, fo_ref, None, None, None,
                 prev, last8)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tau", "interpret", "band"))
def collide_stream_cavity_lean(
    f: jnp.ndarray,      # (Q, NY, NX)
    u_lid_dyn,
    *,
    tau: float,
    interpret: bool = False,
    band: int = 0,
) -> jnp.ndarray:
    """One fused cavity step, populations only (see _make_lean_kernel).
    Returns f_new; compute macros on demand with ops.cavity.macros_guarded.
    """
    Qd, NY, NX = f.shape
    assert Qd == Q
    dt = f.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    ty = band or _pick_band(NY, NX, jnp.dtype(cdt).itemsize)
    if ty < 8 or NY % ty or ty % 8:
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

    pop_in = pl.BlockSpec((Q, ty, NX), lambda k: (0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((Q, ty, NX), lambda k: (0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    lid_in = pl.BlockSpec((1, NX), lambda k: (0, 0),
                          memory_space=pltpu.VMEM)

    ulid_row = jnp.broadcast_to(jnp.asarray(u_lid_dyn, cdt), (1, NX))
    kernel = _make_lean_kernel(float(tau), ty, nk,
                               dt_store=(dt if dt == jnp.bfloat16 else None))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, lid_in],
        out_specs=pop_out,
        out_shape=jax.ShapeDtypeStruct(f.shape, dt),
        scratch_shapes=[
            pltpu.VMEM((Q, ty, NX), cdt),
            pltpu.VMEM((3, 8, NX), cdt),
        ],
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=int(170 * NY * NX),
            bytes_accessed=2 * Q * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, ulid_row)


def _make_lean_halo_kernel(tau: float, ty: int, nk: int, dt_store=None):
    """Sharded lean variant: populations-only HBM traffic AND
    populations-only ICI halos. The neighbor strips arrive as pre-collision
    f rows; their macros are recomputed in-register exactly the way the
    owning shard recomputes its own (lean mode stores no macros anywhere),
    so the redundant halo collide is elementwise-identical to the
    neighbor's own result. Wall/lid fixups gated by flag rows as in
    _make_halo_kernel."""
    emit = _make_emit(ty, nk, dt_store)

    def collide_strip(f_ref):
        fdec = [_decode_dir(f_ref[i], i) for i in range(Q)]
        rho, ux, uy = macros_guarded(fdec)
        fd = collide_dirs(fdec, rho, ux, uy, tau)
        return [_roll_x(fd[i], CX[i]) for i in range(Q)]

    def kernel(f_ref, fup_ref, fdn_ref, aux_ref, fo_ref, prev, last8):
        k = pl.program_id(0)
        ulid_row = aux_ref[0:1, :]
        bflag = aux_ref[1:2, :]
        tflag = aux_ref[2:3, :]

        @pl.when(k < nk)
        def _():
            # seed last8 with the collided upper strip (only row 7 — the
            # row immediately above the shard — is ever consumed)
            @pl.when(k == 0)
            def _():
                fvu = collide_strip(fup_ref)
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi] = fvu[i]

            fdec = [_decode_dir(f_ref[i], i) for i in range(Q)]
            rho, ux, uy = macros_guarded(fdec)
            fd = collide_dirs(fdec, rho, ux, uy, tau)
            fv = [_roll_x(fd[i], CX[i]) for i in range(Q)]

            @pl.when(k >= 1)
            def _():
                below = [fv[i][0:1] for i in _DIRS_NEG]
                emit(k, below, ulid_row, fo_ref, None, None, None,
                     prev, last8, bflag_row=bflag, tflag_row=tflag)
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi] = prev[i, ty - 8:, :]

            for i in range(Q):
                prev[i] = fv[i]

        @pl.when(k == nk)
        def _():
            fvd = collide_strip(fdn_ref)
            below = [fvd[i][0:1] for i in _DIRS_NEG]
            emit(k, below, ulid_row, fo_ref, None, None, None,
                 prev, last8, bflag_row=bflag, tflag_row=tflag)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tau", "interpret", "band"))
def collide_stream_cavity_halo_lean(
    f: jnp.ndarray,      # (Q, NYl, NX) local y-shard
    f_up: jnp.ndarray,   # (Q, 8, NX) pre-collision rows above the shard
    f_dn: jnp.ndarray,   # (Q, 8, NX) rows below
    u_lid_dyn,           # traced scalar
    bottom,              # traced 0/1 scalar: this shard holds y=0
    top,                 # traced 0/1 scalar: this shard holds y=NY-1
    *,
    tau: float,
    interpret: bool = False,
    band: int = 0,
) -> jnp.ndarray:
    """Fused lean cavity step for one y-shard: populations-only halos
    (9 planes per strip instead of the stored-macro protocol's 12) and
    populations-only HBM traffic. Returns f_new; macros on demand via
    ops.cavity.macros_guarded. Accuracy contract identical to the
    single-device lean kernel (f32: Ghia-identical; bf16: documented
    trade, docs/STATUS.md)."""
    Qd, NY, NX = f.shape
    assert Qd == Q
    dt = f.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    ty = band or _pick_band(NY, NX, jnp.dtype(cdt).itemsize)
    if ty < 8 or NY % ty or ty % 8:
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

    pop_in = pl.BlockSpec((Q, ty, NX), lambda k: (0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((Q, ty, NX), lambda k: (0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    halo_pop = pl.BlockSpec((Q, 8, NX), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    aux_in = pl.BlockSpec((3, NX), lambda k: (0, 0),
                          memory_space=pltpu.VMEM)

    aux = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(u_lid_dyn, cdt), (1, NX)),
        jnp.broadcast_to(jnp.asarray(bottom, cdt), (1, NX)),
        jnp.broadcast_to(jnp.asarray(top, cdt), (1, NX)),
    ], axis=0)

    kernel = _make_lean_halo_kernel(
        float(tau), ty, nk, dt_store=(dt if dt == jnp.bfloat16 else None))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, halo_pop, halo_pop, aux_in],
        out_specs=pop_out,
        out_shape=jax.ShapeDtypeStruct(f.shape, dt),
        scratch_shapes=[
            pltpu.VMEM((Q, ty, NX), cdt),
            pltpu.VMEM((3, 8, NX), cdt),
        ],
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=int(170 * NY * NX),
            bytes_accessed=2 * Q * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, f_up, f_dn, aux)


def _make_halo_kernel(tau: float, ty: int, nk: int, dt_store=None):
    """Sharded (y-row-sharded) variant: the rows above/below the shard
    arrive as pre-collision 8-row strips (+ their stored macros) exchanged
    over ICI, and are collided redundantly in-kernel — elementwise math,
    so bitwise-identical to the neighbor's own result. The bottom-wall and
    lid fixups are gated by 0/1 flag rows so only the shards holding the
    global walls apply them (interior shards stream across the boundary).
    """
    emit = _make_emit(ty, nk, dt_store)

    def collide_strip(f_ref, mac_ref):
        fd = collide_dirs([_decode_dir(f_ref[i], i) for i in range(Q)],
                          mac_ref[0], mac_ref[1], mac_ref[2], tau)
        return [_roll_x(fd[i], CX[i]) for i in range(Q)]

    def kernel(f_ref, rho_ref, ux_ref, uy_ref,
               fup_ref, mup_ref, fdn_ref, mdn_ref, aux_ref,
               fo_ref, rho_o, ux_o, uy_o,
               prev, last8):
        k = pl.program_id(0)
        ulid_row = aux_ref[0:1, :]
        bflag = aux_ref[1:2, :]
        tflag = aux_ref[2:3, :]

        @pl.when(k < nk)
        def _():
            # seed last8 with the collided upper strip (only row 7 — the
            # row immediately above the shard — is ever consumed)
            @pl.when(k == 0)
            def _():
                fvu = collide_strip(fup_ref, mup_ref)
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi] = fvu[i]

            fd = collide_dirs([_decode_dir(f_ref[i], i) for i in range(Q)],
                              rho_ref[:], ux_ref[:], uy_ref[:], tau)
            fv = [_roll_x(fd[i], CX[i]) for i in range(Q)]

            @pl.when(k >= 1)
            def _():
                below = [fv[i][0:1] for i in _DIRS_NEG]
                emit(k, below, ulid_row,
                     fo_ref, rho_o, ux_o, uy_o, prev, last8,
                     bflag_row=bflag, tflag_row=tflag)
                for gi, i in enumerate(_DIRS_POS):
                    last8[gi] = prev[i, ty - 8:, :]

            for i in range(Q):
                prev[i] = fv[i]

        @pl.when(k == nk)
        def _():
            fvd = collide_strip(fdn_ref, mdn_ref)
            below = [fvd[i][0:1] for i in _DIRS_NEG]
            emit(k, below, ulid_row,
                 fo_ref, rho_o, ux_o, uy_o, prev, last8,
                 bflag_row=bflag, tflag_row=tflag)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tau", "interpret", "band"))
def collide_stream_cavity_halo(
    f: jnp.ndarray,      # (Q, NYl, NX) local y-shard
    rho: jnp.ndarray,    # (NYl, NX)
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    f_up: jnp.ndarray,   # (Q, 8, NX) pre-collision rows above the shard
    mac_up: jnp.ndarray,  # (3, 8, NX) their stored rho/ux/uy
    f_dn: jnp.ndarray,   # (Q, 8, NX) rows below
    mac_dn: jnp.ndarray,
    u_lid_dyn,           # traced scalar
    bottom,              # traced 0/1 scalar: this shard holds y=0
    top,                 # traced 0/1 scalar: this shard holds y=NY-1
    *,
    tau: float,
    interpret: bool = False,
    band: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused cavity step for one y-shard with explicit halo strips.

    Only the upper strip's LAST row and the lower strip's FIRST row are
    consumed; 8-row strips keep the VMEM refs sublane-aligned. On wall
    shards the corresponding strip is ignored (the wall fixups win), so
    ring-wrapped ppermute exchanges are fine.
    """
    Qd, NY, NX = f.shape
    assert Qd == Q
    dt = f.dtype
    cdt = rho.dtype
    if dt == jnp.bfloat16 and cdt != jnp.float32:
        raise ValueError("bf16 f storage requires f32 macros")
    ty = band or _pick_band(NY, NX, jnp.dtype(cdt).itemsize)
    if ty < 8 or NY % ty or ty % 8:
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

    pop_in = pl.BlockSpec((Q, ty, NX), lambda k: (0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((Q, ty, NX), lambda k: (0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    fld_out = pl.BlockSpec((ty, NX), lambda k: (out_band(k), 0),
                           memory_space=pltpu.VMEM)
    halo_pop = pl.BlockSpec((Q, 8, NX), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    halo_mac = pl.BlockSpec((3, 8, NX), lambda k: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    aux_in = pl.BlockSpec((3, NX), lambda k: (0, 0),
                          memory_space=pltpu.VMEM)

    aux = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(u_lid_dyn, cdt), (1, NX)),
        jnp.broadcast_to(jnp.asarray(bottom, cdt), (1, NX)),
        jnp.broadcast_to(jnp.asarray(top, cdt), (1, NX)),
    ], axis=0)

    kernel = _make_halo_kernel(float(tau), ty, nk,
                               dt_store=(dt if dt == jnp.bfloat16 else None))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, fld_in, fld_in, fld_in,
                  halo_pop, halo_mac, halo_pop, halo_mac, aux_in],
        out_specs=(pop_out, fld_out, fld_out, fld_out),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(rho.shape, cdt),
            jax.ShapeDtypeStruct(ux.shape, cdt),
            jax.ShapeDtypeStruct(uy.shape, cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, ty, NX), cdt),
            pltpu.VMEM((3, 8, NX), cdt),
        ],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        cost_estimate=pl.CostEstimate(
            flops=int(150 * NY * NX),
            bytes_accessed=2 * NY * NX * (Q * dt.itemsize
                                          + 3 * jnp.dtype(cdt).itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, rho, ux, uy, f_up, mac_up, f_dn, mac_dn, aux)


def _roll_y(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Periodic row shift on a loaded (rows, NX) value (jnp.roll semantics).
    Arbitrary offsets are legal on VALUES (only ref slices must be
    8-row-aligned), so the whole-plane shift is a pair of value slices."""
    if shift == 0:
        return a
    return jnp.concatenate((a[-shift:], a[:-shift]), axis=0)


def check_vmem_multistep(NY: int, NX: int, itemsize: int,
                         budget: int = 90 * 1024 * 1024) -> bool:
    """Whole-grid VMEM residency feasibility for the multi-step kernel:
    in + out blocks, the f32 working scratch, and ~24 live temporary
    planes during the collide."""
    need = (
        2 * Q * NY * NX * itemsize      # in + out blocks (grid=(1,): single)
        + Q * NY * NX * 4               # f32 working scratch
        + 24 * NY * NX * 4              # live temporaries
    )
    return need < budget


def _make_multistep_kernel(tau: float, k_steps: int, NY: int, NX: int,
                           u_lid: float, sigma: float, dt_store=None,
                           gated: bool = False):
    """K whole cavity steps per kernel launch, state resident in VMEM.

    No band pipeline: the full (Q, NY, NX) grid lives in an f32 scratch
    for all K steps — zero HBM traffic between steps, one read + one write
    of the populations per WINDOW instead of per step (temporal blocking).
    Per-step math is byte-for-byte the lean kernel's (recompute macros ->
    collide -> pull-stream -> walls/lid), so f32 trajectories equal the
    lean/stored paths to fusion-context ulp. In bf16 storage the K-step
    window rounds ONCE at the final store instead of every step — strictly
    fewer roundings than the per-step bf16 kernel (accuracy between f32
    and per-step bf16; a different, documented trajectory).

    The lid ramp is evaluated in-kernel from the window's starting step
    (aux row): u_lid_dyn(t) = u_lid * t / sigma for t < sigma
    (old codes/LBM_classic/LBM.cpp:180).

    gated=True is the multi-chip variant: the bottom-wall / lid rows are
    TRACED row indices (aux (2, NX) rows; -1 disables) instead of the
    static grid edges, so a K-deep-ghost extended shard applies the
    global walls only where it actually holds them — the wall overwrite
    consumes same-row data only, so it also BLOCKS the boundary shards'
    garbage ghost rows from streaming inward. Side (x) walls span every
    row and stay unconditional."""

    def step_planes(f, u_lid_dyn, b_row=None, l_row=None):
        """One full cavity step on 9 loaded (NY, NX) planes."""
        rho, ux, uy = macros_guarded(f)
        fd = collide_dirs(f, rho, ux, uy, tau)
        # pull streaming = periodic roll by +c, then the walls overwrite
        # every row/column the wrap got wrong (same order as the band
        # kernel's emit: sides -> bottom -> lid encodes the corner winners)
        pv = [_roll_x(fd[i], CX[i]) for i in range(Q)]
        out = [_roll_y(pv[i], CY[i]) for i in range(Q)]

        def set_col0(a, col):
            return jnp.concatenate((col, a[:, 1:]), axis=1)

        def set_colN(a, col):
            return jnp.concatenate((a[:, :-1], col), axis=1)

        # side walls: pre-streaming wall values live at the x-rolled
        # planes' wrap columns
        out[1] = set_col0(out[1], pv[3][:, -1:])
        out[8] = set_col0(out[8], pv[6][:, -1:])
        out[5] = set_col0(out[5], pv[7][:, -1:])
        out[3] = set_colN(out[3], pv[1][:, :1])
        out[7] = set_colN(out[7], pv[5][:, :1])
        out[6] = set_colN(out[6], pv[8][:, :1])

        iota = jax.lax.broadcasted_iota(jnp.int32, (NY, 1), 0)
        if gated:
            fi = iota.astype(b_row.dtype)   # row index exact in f32
            is_b = fi == b_row              # (NY, NX) masks
            is_t = fi == l_row
        else:
            is_b = iota == 0
            is_t = iota == NY - 1

        def unroll_row(i, rows):
            return _roll_x(rows, -CX[i])

        # bottom wall (row 0 of the cy=+1 populations)
        out[2] = jnp.where(is_b, pv[4], out[2])
        out[5] = jnp.where(is_b, unroll_row(7, pv[7]), out[5])
        out[6] = jnp.where(is_b, unroll_row(8, pv[8]), out[6])

        # moving lid (row NY-1 of the cy=-1 populations), written after the
        # walls so the lid wins the two top corners
        top = [unroll_row(i, pv[i]) for i in range(Q)]
        rho_top = sum_dirs(top)
        d5, d6 = lid_deltas(rho_top, u_lid_dyn)
        out[4] = jnp.where(is_t, top[2], out[4])
        out[7] = jnp.where(is_t, top[5] + d5, out[7])
        out[8] = jnp.where(is_t, top[6] + d6, out[8])
        return out

    def kernel(f_ref, t0_ref, fo_ref, work):
        # window's starting step as a broadcast (1, NX) row (scalar VMEM
        # reads are fragile under Mosaic; rows broadcast fine)
        t0_row = t0_ref[0:1, :]

        for i in range(Q):
            work[i] = _decode_dir(f_ref[i], i)

        def body(i, _):
            t = t0_row + jnp.asarray(i, t0_row.dtype)
            u_lid_dyn = jnp.where(t < sigma, u_lid / sigma * t,
                                  jnp.full_like(t, u_lid))
            out = step_planes([work[j] for j in range(Q)], u_lid_dyn)
            for j in range(Q):
                work[j] = out[j]
            return 0

        jax.lax.fori_loop(0, k_steps, body, 0)
        for i in range(Q):
            fo_ref[i] = _encode_dir(work[i], i, dt_store)

    def kernel_gated(f_ref, t0_ref, bl_ref, fo_ref, work):
        t0_row = t0_ref[0:1, :]
        b_row = bl_ref[0:1, :]
        l_row = bl_ref[1:2, :]

        for i in range(Q):
            work[i] = _decode_dir(f_ref[i], i)

        def body(i, _):
            t = t0_row + jnp.asarray(i, t0_row.dtype)
            u_lid_dyn = jnp.where(t < sigma, u_lid / sigma * t,
                                  jnp.full_like(t, u_lid))
            out = step_planes([work[j] for j in range(Q)], u_lid_dyn,
                              b_row, l_row)
            for j in range(Q):
                work[j] = out[j]
            return 0

        jax.lax.fori_loop(0, k_steps, body, 0)
        for i in range(Q):
            fo_ref[i] = _encode_dir(work[i], i, dt_store)

    return kernel_gated if gated else kernel


@functools.partial(
    jax.jit,
    static_argnames=("tau", "k_steps", "u_lid", "sigma", "interpret"))
def collide_stream_cavity_multistep(
    f: jnp.ndarray,      # (Q, NY, NX)
    step0,               # traced scalar: trajectory step at window start
    *,
    tau: float,
    k_steps: int,
    u_lid: float,
    sigma: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """k_steps fused cavity steps in ONE kernel launch (VMEM-resident
    temporal blocking; see _make_multistep_kernel). Lean semantics:
    populations only — macros on demand via ops.cavity.macros_guarded.
    Requires check_vmem_multistep(NY, NX, itemsize). Any NY: the kernel
    is pure value-level ops on whole planes (concats/wheres/iota masks),
    so Mosaic's (8, 128) tile padding handles unaligned grids — the
    literal Ghia 129^2 grid runs here (the BANDED cavity kernels keep
    their NY % 8 gates: their ref slices need sublane alignment)."""
    Qd, NY, NX = f.shape
    assert Qd == Q
    dt = f.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    if not check_vmem_multistep(NY, NX, jnp.dtype(dt).itemsize):
        raise ValueError(
            f"{NY}x{NX} exceeds the multi-step kernel's whole-grid VMEM "
            f"budget (use the banded kernels)")
    if k_steps < 1:
        raise ValueError("k_steps must be >= 1")

    t0_row = jnp.broadcast_to(
        jnp.asarray(step0).astype(cdt).reshape(1, 1), (1, NX))
    kernel = _make_multistep_kernel(
        float(tau), int(k_steps), NY, NX, float(u_lid), float(sigma),
        dt_store=(dt if dt == jnp.bfloat16 else None))
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((Q, NY, NX), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NX), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, NY, NX), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f.shape, dt),
        scratch_shapes=[pltpu.VMEM((Q, NY, NX), cdt)],
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=int(170 * NY * NX) * int(k_steps),
            bytes_accessed=2 * Q * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, t0_row)


@functools.partial(
    jax.jit,
    static_argnames=("tau", "k_steps", "u_lid", "sigma", "interpret"))
def collide_stream_cavity_multistep_gated(
    f: jnp.ndarray,      # (Q, NY_ext, NX) — K-deep-ghost extended shard
    step0,               # traced scalar: trajectory step at window start
    wall_rows,           # traced (2,) array: [bottom row, lid row]; -1 = off
    *,
    tau: float,
    k_steps: int,
    u_lid: float,
    sigma: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-chip window variant of collide_stream_cavity_multistep: the
    bottom-wall / lid fixup rows are traced indices (-1 disables), so the
    kernel runs on a ghost-extended shard and applies the global walls
    only on the shards that hold them (see _make_multistep_kernel,
    gated=True). The caller slices the exact interior afterwards."""
    Qd, NY, NX = f.shape
    assert Qd == Q
    dt = f.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    if not check_vmem_multistep(NY, NX, jnp.dtype(dt).itemsize):
        raise ValueError(
            f"{NY}x{NX} exceeds the multi-step kernel's whole-grid VMEM "
            f"budget (use the per-step sharded kernels)")
    if k_steps < 1:
        raise ValueError("k_steps must be >= 1")

    t0_row = jnp.broadcast_to(
        jnp.asarray(step0).astype(cdt).reshape(1, 1), (1, NX))
    bl = jnp.broadcast_to(
        jnp.asarray(wall_rows).astype(cdt).reshape(2, 1), (2, NX))
    kernel = _make_multistep_kernel(
        float(tau), int(k_steps), NY, NX, float(u_lid), float(sigma),
        dt_store=(dt if dt == jnp.bfloat16 else None), gated=True)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((Q, NY, NX), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NX), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, NX), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, NY, NX), lambda k: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(f.shape, dt),
        scratch_shapes=[pltpu.VMEM((Q, NY, NX), cdt)],
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=int(170 * NY * NX) * int(k_steps),
            bytes_accessed=2 * Q * NY * NX * dt.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, t0_row, bl)


def pick_multistep_bands(NY: int, NX: int, itemsize: int,
                         k_steps: int) -> int | None:
    """Smallest band count B >= 2 such that NY % B == 0, the K-deep ghost
    extension fits a band (K <= NY // B), and the extended
    (NY // B + 2K, NX) band passes check_vmem_multistep. None when no
    such B exists (K too deep for any feasible band height)."""
    for B in range(2, NY + 1):
        if NY % B:
            continue
        R = NY // B
        if k_steps > R:
            return None  # growing B only shrinks R further
        if check_vmem_multistep(R + 2 * k_steps, NX, itemsize):
            return B
    return None


@functools.partial(
    jax.jit,
    static_argnames=("tau", "k_steps", "u_lid", "sigma", "bands",
                     "interpret"))
def collide_stream_cavity_multistep_banded(
    f: jnp.ndarray,      # (Q, NY, NX)
    step0,               # traced scalar: trajectory step at window start
    *,
    tau: float,
    k_steps: int,
    u_lid: float,
    sigma: float,
    bands: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Temporal blocking at grids BIGGER than the whole-grid VMEM budget:
    the single-device analog of
    parallel.fused_sharded.make_fused_sharded_cavity_multistep_rollout,
    with the ghost slabs sliced straight from the global array instead of
    ppermuted from a neighbor chip.

    The grid is split into `bands` row-bands of R = NY // bands rows.
    Each band is extended by K ghost rows on both sides (true pre-window
    values for interior neighbors; the boundary bands' outer ghosts wrap
    around the array and hold garbage) and the GATED multistep kernel
    runs K whole steps on the extended (R + 2K, NX) band: the traced
    bottom-wall/lid rows land only on the bands that hold them, and the
    wall overwrite — which consumes same-row data only — BLOCKS the
    boundary bands' garbage ghosts from streaming inward, while on
    interior bands the sharded rollout's trapezoid argument applies
    unchanged (the kernel's wrong y-wrap corrupts the extension at one
    row per step < the K-deep ghost). The [K:-K] interior of every band
    is therefore exact, and the K-step window costs one HBM read of
    (1 + 2K*B/NY) states + one write per window instead of a read+write
    per STEP — the banded per-step kernels' bandwidth bound is replaced
    by the multistep kernel's VPU-compute bound at a (1 + 2K*B/NY)
    redundancy factor.

    Requires NY % bands == 0 and k_steps <= NY // bands (the ghost slices
    must come from the adjacent band only).

    Structure: the grid is padded once with its K-row wrap slabs and a
    lax.map marches the bands through ONE traced kernel instance
    (dynamic_slice at b*R + traced wall rows), so the program size —
    and the compile time — is independent of the band count (a 4096^2
    f32 grid needs 64 bands)."""
    Qd, NY, NX = f.shape
    assert Qd == Q
    B = int(bands)
    K = int(k_steps)
    if B < 2 or NY % B:
        raise ValueError(f"bands={B} must be >= 2 and divide NY={NY}")
    R = NY // B
    if K > R:
        raise ValueError(f"k_steps={K} exceeds band rows={R}; ghost "
                         f"slices span one neighbor band only (fewer "
                         f"bands or smaller K)")
    itemsize = jnp.dtype(f.dtype).itemsize
    if not check_vmem_multistep(R + 2 * K, NX, itemsize):
        raise ValueError(
            f"extended band ({R}+2*{K}) x {NX} exceeds the multistep "
            f"kernel's VMEM budget (more bands or smaller K)")

    # wrap padding: band b's extended slab is rows [b*R, b*R + R + 2K)
    # of the padded array — the b=0 / b=B-1 outer ghosts are the wrap
    # slabs (garbage below the wall / above the lid, blocked in-kernel)
    padded = jnp.concatenate([f[:, NY - K:, :], f, f[:, :K, :]], axis=1)

    def band(b):
        fe = jax.lax.dynamic_slice_in_dim(padded, b * R, R + 2 * K, axis=1)
        wall = jnp.stack([
            jnp.where(b == 0, jnp.float32(K), jnp.float32(-1.0)),
            jnp.where(b == B - 1, jnp.float32(K + R - 1),
                      jnp.float32(-1.0))])
        fe = collide_stream_cavity_multistep_gated(
            fe, step0, wall, tau=tau, k_steps=K, u_lid=u_lid,
            sigma=sigma, interpret=interpret)
        return fe[:, K:-K, :]

    outs = jax.lax.map(band, jnp.arange(B, dtype=jnp.int32))
    return jnp.moveaxis(outs, 0, 1).reshape(Q, NY, NX)


def _pick_band(NY: int, NX: int, itemsize: int) -> int:
    """Largest feasible band height (multiple of 8 dividing NY).

    VMEM model: in/out blocks double-buffered (2*(Q+3) planes each way),
    prev scratch (Q planes), last8 chunks, ~32 live compute temporaries.
    The cavity moves only 24 planes per grid step (vs the plasma kernel's
    108), so per-grid-step overhead matters more: prefer TALL bands.
    """
    budget = 90 * 1024 * 1024
    for ty in range(min(NY, 256) - min(NY, 256) % 8, 7, -8):
        if NY % ty:
            continue
        vmem = (
            (2 + 2) * 2 * (Q + 3) * ty * NX * itemsize  # in+out, dbl-buffered
            + Q * ty * NX * itemsize                     # prev
            + 3 * 8 * NX * itemsize                      # last8
            + 32 * ty * NX * max(itemsize, 4)            # live temporaries
        )
        if vmem < budget:
            return ty
    raise ValueError(f"no feasible cavity band height for {NY}x{NX} "
                     f"(NY must be divisible by a multiple of 8)")


@functools.partial(
    jax.jit, static_argnames=("tau", "interpret", "band"))
def collide_stream_cavity(
    f: jnp.ndarray,      # (Q, NY, NX)
    rho: jnp.ndarray,    # (NY, NX) stored macros (consumed by the collide)
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    u_lid_dyn,           # traced scalar: lid speed at this step
    *,
    tau: float,
    interpret: bool = False,
    band: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused cavity step. Returns (f_new, rho, ux, uy) — the streamed
    populations and their guarded macros, exactly as models/cavity.py's
    jnp step computes them. f may be bf16 (delta storage, see _decode_dir);
    the macros always carry the compute dtype."""
    Qd, NY, NX = f.shape
    assert Qd == Q
    dt = f.dtype
    cdt = rho.dtype
    if dt == jnp.bfloat16 and cdt != jnp.float32:
        raise ValueError("bf16 f storage requires f32 macros")
    ty = band or _pick_band(NY, NX, jnp.dtype(cdt).itemsize)
    if ty < 8 or NY % ty or ty % 8:
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

    pop_in = pl.BlockSpec((Q, ty, NX), lambda k: (0, in_band(k), 0),
                          memory_space=pltpu.VMEM)
    fld_in = pl.BlockSpec((ty, NX), lambda k: (in_band(k), 0),
                          memory_space=pltpu.VMEM)
    pop_out = pl.BlockSpec((Q, ty, NX), lambda k: (0, out_band(k), 0),
                           memory_space=pltpu.VMEM)
    fld_out = pl.BlockSpec((ty, NX), lambda k: (out_band(k), 0),
                           memory_space=pltpu.VMEM)
    lid_in = pl.BlockSpec((1, NX), lambda k: (0, 0),
                          memory_space=pltpu.VMEM)

    ulid_row = jnp.broadcast_to(
        jnp.asarray(u_lid_dyn, cdt), (1, NX))

    kernel = _make_kernel(float(tau), ty, nk,
                          dt_store=(dt if dt == jnp.bfloat16 else None))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pop_in, fld_in, fld_in, fld_in, lid_in],
        out_specs=(pop_out, fld_out, fld_out, fld_out),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, dt),
            jax.ShapeDtypeStruct(rho.shape, cdt),
            jax.ShapeDtypeStruct(ux.shape, cdt),
            jax.ShapeDtypeStruct(uy.shape, cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, ty, NX), cdt),   # prev (x-rolled f32 planes)
            pltpu.VMEM((3, 8, NX), cdt),    # last 8 rows of band k-2
        ],
        # in-place HBM update: band b's region is fetched (step <= b) before
        # its output is written (step b+1) — same schedule as the plasma
        # halo kernels
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        cost_estimate=pl.CostEstimate(
            flops=int(150 * NY * NX),
            bytes_accessed=2 * NY * NX * (Q * dt.itemsize
                                          + 3 * jnp.dtype(cdt).itemsize),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, rho, ux, uy, ulid_row)
