"""Streaming (advection) step and boundary conditions.

The plasma reference streams *push*-style (temp[x+c] = f[x]) with either
periodic wrap or wall bounce-back (reference: src/streaming.cpp:35-112); the
cavity predecessor streams *pull*-style with three bounce-back walls and a
Zou/He-style moving lid on the top row (old codes/LBM_classic/LBM.cpp:105-159).
Both are reproduced here.

On TPU, periodic streaming is 9 shifted copies (jnp.roll -> XLA dynamic-slice
fusion; under sharding the wrap becomes a collective-permute over ICI).
Bounce-back is a fixed permutation of the (Q, NY, NX) lattice; it is applied
as periodic rolls plus static edge-row fixups (no gather/scatter in the hot
path). A flat-gather oracle built directly from the reference's 4-case write
logic is kept for testing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import D2Q9

CX = D2Q9.CX
CY = D2Q9.CY
OPP = D2Q9.OPP
Q = D2Q9.Q


def stream_periodic(f: jnp.ndarray) -> jnp.ndarray:
    """Push-periodic streaming of (..., Q, NY, NX) populations.

    temp[y+cy, x+cx, i] = f[y, x, i]  with wraparound
    (reference: src/streaming.cpp:35-59).
    """
    parts = [
        jnp.roll(f[..., i, :, :], shift=(int(CY[i]), int(CX[i])), axis=(-2, -1))
        for i in range(Q)
    ]
    return jnp.stack(parts, axis=-3)


# ---------------------------------------------------------------------------
# Bounce-back walls on all four domain edges (plasma BounceBack mode)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bounceback_gather_map(NX: int, NY: int):
    """Flat gather indices implementing the reference's push bounce-back.

    Builds the destination map exactly as src/streaming.cpp:70-105 (interior
    push; x-in/y-out -> (x+cx, y, opp); x-out/y-in -> (x, y+cy, opp); both
    out -> (x, y, opp)). The map is NOT a permutation: at each domain corner
    one inward diagonal slot is written three times and two slots are never
    written. The reference's loop is a bare `omp for` with no enclosing
    parallel region — it runs serially in (x, y, i) order — so duplicate
    writes resolve deterministically to the LAST source in that order, and
    unwritten slots retain the stale contents of the destination buffer
    (pre-collision f for the f-streaming call, post-collision f for the
    g-streaming call, by the reference's temp-buffer swap chain). Both
    behaviors are replicated bit-for-bit.

    Returns (src, hole): flat source index per destination (holes map to
    themselves) and a boolean hole mask. Flat convention: (i*NY + y)*NX + x.
    """
    size = Q * NY * NX
    src = np.full(size, -1, dtype=np.int64)

    def flat(i, y, x):
        return (i * NY + y) * NX + x

    # serial write order of the reference: x outer, then y, then i;
    # later writes overwrite earlier ones.
    for x in range(NX):
        for y in range(NY):
            for i in range(Q):
                dx, dy = int(CX[i]), int(CY[i])
                o = int(OPP[i])
                xs, ys = x + dx, y + dy
                x_in = 0 <= xs < NX
                y_in = 0 <= ys < NY
                if x_in and y_in:
                    d = flat(i, ys, xs)
                elif x_in:            # y blocked: slide in x, reflect
                    d = flat(o, y, xs)
                elif y_in:            # x blocked: slide in y, reflect
                    d = flat(o, ys, x)
                else:                 # corner: reflect in place
                    d = flat(o, y, x)
                src[d] = flat(i, y, x)

    hole = src < 0
    src = np.where(hole, np.arange(size), src)
    return src, hole


def stream_bounceback_gather(f: jnp.ndarray, stale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Flat-gather implementation of push bounce-back (test oracle).

    Built directly from the reference's 4-case write logic; kept as the
    independent cross-check for the slice-fixup fast path below.
    """
    NY, NX = f.shape[-2], f.shape[-1]
    src_np, hole_np = _bounceback_gather_map(NX, NY)
    src = jnp.asarray(src_np)
    hole = jnp.asarray(hole_np)
    lead = f.shape[:-3]
    flat = f.reshape(lead + (Q * NY * NX,))
    out = jnp.take(flat, src, axis=-1)
    if stale is None:
        stale_flat = flat
    else:
        stale_flat = stale.reshape(lead + (Q * NY * NX,))
    out = jnp.where(hole, stale_flat, out)
    return out.reshape(f.shape)


# The 8 corner slots the reference's serial write loop never reaches (two
# per corner); they retain the destination temp-buffer's stale contents.
# Order matters only for pairing with hole_values(). Entries are (i, y, x)
# with -1 meaning the last row/column.
HOLE_SLOTS = (
    (6, 0, 0), (8, 0, 0),           # bottom-left
    (5, 0, -1), (7, 0, -1),         # bottom-right
    (5, -1, 0), (7, -1, 0),         # top-left
    (6, -1, -1), (8, -1, -1),       # top-right
)


def hole_values(a: jnp.ndarray) -> list:
    """The 8 stale values bounce-back leaves at the corner holes, read from
    the buffer whose contents the reference's recycled temp would hold
    (pre-collision f for the f pass, post-collision f for the g pass)."""
    return [a[..., i, y, x] for (i, y, x) in HOLE_SLOTS]


def hole_values_from_periodic(out_p: jnp.ndarray) -> list:
    """hole_values(f_post) recovered from the PERIODIC streaming result:
    f_post[i, y, x] = out_p[i, (y+cy_i) % NY, (x+cx_i) % NX]. Lets the fused
    kernel (which streams in place and never materializes f_post) supply the
    g pass's stale corner values."""
    NY, NX = out_p.shape[-2], out_p.shape[-1]
    vals = []
    for (i, y, x) in HOLE_SLOTS:
        yy = (y % NY + int(CY[i])) % NY
        xx = (x % NX + int(CX[i])) % NX
        vals.append(out_p[..., i, yy, xx])
    return vals


def bounceback_from_periodic(out: jnp.ndarray, hole_vals: list) -> jnp.ndarray:
    """Convert a push-PERIODIC streamed lattice into the reference's push
    bounce-back result via static edge fixups — the TPU-native hot path
    (no gather/scatter; a handful of one-row/one-column dynamic-update
    slices XLA applies in place).

    Derivation: bounce-back differs from periodic only where the push
    crossed a wall (src/streaming.cpp:70-105). Every reflected value is a
    post-collision population, and the periodic result already contains
    every post-collision value at a shifted index
    (f_post[i,y,x] = out[i, y+cy, x+cx]), so all fixups read single
    rows/columns of `out` itself. Duplicate corner writes resolve by the
    reference's serial (x, y, i) order — encoded here in the update order
    plus one explicit corner override — and the 8 never-written corner
    holes take `hole_vals` (see hole_values / HOLE_SLOTS).

    out: (..., Q, NY, NX) periodic push-streaming result.
    hole_vals: 8 arrays/scalars in HOLE_SLOTS order.

    Every update is a FULL edge row or column: the corner-hole values and
    the (7,-1,-1) serial-order override are concatenated onto the adjacent
    edge slices instead of written as scalar updates. Semantically
    identical to per-scalar writes in the reference's order, and required
    for correctness under GSPMD: a scalar dynamic-update-slice chained
    after overlapping edge-slice updates on a lattice-sharded array is
    miscompiled by the SPMD partitioner (observed on jax 0.8: the scalar
    lands on every shard's local corner; the full-row/column forms
    partition correctly).
    """
    lead = out.shape[:-3]

    def one(v):
        """A hole/corner value as a length-1 slice broadcast over lead."""
        return jnp.broadcast_to(jnp.asarray(v, out.dtype), lead)[..., None]

    def cat(*parts):
        return jnp.concatenate(parts, axis=-1)

    # All sources are read from the pristine periodic result first.
    src_1 = out[..., 3, :, -1]        # f_post[3][:, 0]
    src_3 = out[..., 1, :, 0]         # f_post[1][:, -1]
    src_2 = out[..., 4, -1, :]        # f_post[4][0, :]
    src_4 = out[..., 2, 0, :]         # f_post[2][-1, :]
    NYd, NXd = out.shape[-2], out.shape[-1]
    (h6a, h8a, h5b, h7a, h5a, h7b, h6b, h8b) = [
        one(v) for v in hole_vals]                      # HOLE_SLOTS order
    src_5col = cat(out[..., 7, : NYd - 1, -1], h5a)  # + hole (5, -1, 0)
    src_5row = cat(out[..., 7, -1, : NXd - 1], h5b)  # + hole (5, 0, -1)
    src_6row = cat(h6a, out[..., 8, -1, 1:])         # hole (6, 0, 0) +
    src_6col = cat(out[..., 8, : NYd - 1, 0], h6b)   # + hole (6, -1, -1)
    src_7col = cat(h7a, out[..., 5, 1:, 0])          # hole (7, 0, -1) +
    # hole (7, -1, 0) + row + the (7,-1,-1) corner winner f_post[5][-1,-1]
    src_7row = cat(h7b, out[..., 5, 0, 1: NXd - 1],
                   out[..., 5, 0, 0][..., None])
    src_8col = cat(h8a, out[..., 6, 1:, -1])         # hole (8, 0, 0) +
    src_8row = cat(out[..., 6, 0, : NXd - 1], h8b)   # + hole (8, -1, -1)

    # Axis directions: one column/row each.
    out = out.at[..., 1, :, 0].set(src_1)
    out = out.at[..., 3, :, -1].set(src_3)
    out = out.at[..., 2, 0, :].set(src_2)
    out = out.at[..., 4, -1, :].set(src_4)
    # Diagonals: column/row order encodes the serial-corner winner.
    out = out.at[..., 5, :, 0].set(src_5col)
    out = out.at[..., 5, 0, :].set(src_5row)     # row wins (5,0,0)
    out = out.at[..., 6, 0, :].set(src_6row)
    out = out.at[..., 6, :, -1].set(src_6col)    # col wins (6,0,-1)
    out = out.at[..., 7, :, -1].set(src_7col)
    out = out.at[..., 7, -1, :].set(src_7row)    # row wins (7,-1,-1)
    out = out.at[..., 8, :, 0].set(src_8col)
    out = out.at[..., 8, -1, :].set(src_8row)    # row wins (8,-1,0)
    return out


def bounceback_fix_dirs(out: list, fd: list, holes: list) -> list:
    """bounceback_from_periodic on per-direction PLANES — the kernel-safe
    form (concatenate/where on loaded values only; no .at scatter, no
    captured array constants) used by the temporally-blocked plasma kernel.

    out: Q periodic-rolled (NY, NX) planes (push streaming of fd).
    fd:  the post-collision pre-streaming planes (every wall source is a
         post-collision value; the periodic result holds each of them at a
         shifted index, so reading fd directly is the same value bit-for-bit
         — out[i][y, x] = fd[i][y-cy, x-cx mod N]).
    holes: 8 (1, 1)-broadcastable stale values in HOLE_SLOTS order.

    Update order replicates bounceback_from_periodic exactly (column/row
    write order encodes the reference's serial corner winners); equality is
    pinned by tests against the gather oracle.
    """
    NY, NX = out[0].shape[-2], out[0].shape[-1]
    (h6a, h8a, h5b, h7a, h5a, h7b, h6b, h8b) = [
        jnp.broadcast_to(jnp.asarray(v, out[0].dtype), (1, 1)) for v in holes]

    def set_col0(a, col):
        return jnp.concatenate((col, a[..., :, 1:]), axis=-1)

    def set_colN(a, col):
        return jnp.concatenate((a[..., :, :-1], col), axis=-1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (NY, 1), 0)
    is_b = iota == 0
    is_t = iota == NY - 1

    def cat(*parts):
        return jnp.concatenate(parts, axis=-1)

    # Axis directions: one full column/row each.
    out[1] = set_col0(out[1], fd[3][..., :, 0:1])
    out[3] = set_colN(out[3], fd[1][..., :, -1:])
    out[2] = jnp.where(is_b, fd[4][..., 0:1, :], out[2])
    out[4] = jnp.where(is_t, fd[2][..., -1:, :], out[4])
    # Diagonals: column/row order encodes the serial-corner winner
    # (bounceback_from_periodic's source vectors, read from fd directly).
    out[5] = set_col0(out[5], jnp.concatenate(
        (fd[7][..., 1:, 0:1], h5a), axis=-2))
    out[5] = jnp.where(is_b, cat(fd[7][..., 0:1, 1:], h5b), out[5])
    out[6] = jnp.where(is_b, cat(h6a, fd[8][..., 0:1, :-1]), out[6])
    out[6] = set_colN(out[6], jnp.concatenate(
        (fd[8][..., 1:, -1:], h6b), axis=-2))
    out[7] = set_colN(out[7], jnp.concatenate(
        (h7a, fd[5][..., :-1, -1:]), axis=-2))
    out[7] = jnp.where(
        is_t, cat(h7b, fd[5][..., -1:, :NX - 2], fd[5][..., -1:, -1:]),
        out[7])
    out[8] = set_col0(out[8], jnp.concatenate(
        (h8a, fd[6][..., :-1, 0:1]), axis=-2))
    out[8] = jnp.where(is_t, cat(fd[6][..., -1:, 1:], h8b), out[8])
    return out


def _shift(a: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """Periodic shift on a loaded plane (kernel-safe concatenate form):
    out[y, x] = a[y - sy, x - sx]."""
    if sx:
        a = jnp.concatenate((a[..., :, -sx:], a[..., :, :-sx]), axis=-1)
    if sy:
        a = jnp.concatenate((a[..., -sy:, :], a[..., :-sy, :]), axis=-2)
    return a


def bounceback_fix_dirs_gated(out: list, fd: list, stale: dict,
                              is_b: jnp.ndarray, is_t: jnp.ndarray) -> list:
    """bounceback_fix_dirs with TRACED wall-row masks — the K-deep-ghost
    band/shard form used by the temporally-blocked bounce-back kernels.

    The global bottom/top wall rows become the (NY, NX) masks is_b / is_t
    (built from traced row indices; all-False on bands that hold neither
    wall), so an extended band applies the y-wall reflections only where
    it actually holds them. The x-wall column fixups stay unconditional:
    every band spans the full x extent, so on true rows they reproduce the
    global rows' own fixups and on the boundary bands' garbage wrap-ghost
    rows they are inert. The 8 corner holes read the stale buffer IN PLACE
    (out[i][y, x] = stale[i][y, x], see HOLE_SLOTS), which makes every
    hole entry a same-row select — and since all y-wall sources are
    same-row too (reflections consume the wall row's own post-collision
    values), the gated wall overwrite BLOCKS the boundary bands' garbage
    ghosts from ever streaming inward, exactly the cavity gated kernel's
    argument (kernels/fused_cavity._make_multistep_kernel, gated=True).

    out:   Q periodic-rolled (NY, NX) planes (push streaming of fd).
    fd:    post-collision pre-streaming planes.
    stale: {5, 6, 7, 8} -> full stale plane (pre-collision f for the f
           pass; post-collision f [+ the species-2 delta background] for
           the g pass — models/plasma._g_holes_with_background).
    is_b / is_t: (NY, NX) traced wall-row masks.

    Fixup order replicates bounceback_fix_dirs exactly (the column/row
    write order encodes the reference's serial corner winners,
    src/streaming.cpp:70-105); with masks pinned to the static edges the
    result is bitwise bounceback_fix_dirs' (pinned by tests)."""
    is_b1 = is_b[..., :, 0:1]
    is_t1 = is_t[..., :, 0:1]

    def set_col0(a, col):
        return jnp.concatenate((col, a[..., :, 1:]), axis=-1)

    def set_colN(a, col):
        return jnp.concatenate((a[..., :, :-1], col), axis=-1)

    def cat(*parts):
        return jnp.concatenate(parts, axis=-1)

    # Axis directions: x-wall columns unconditional, y-wall rows gated.
    out[1] = set_col0(out[1], fd[3][..., :, 0:1])
    out[3] = set_colN(out[3], fd[1][..., :, -1:])
    out[2] = jnp.where(is_b, fd[4], out[2])
    out[4] = jnp.where(is_t, fd[2], out[4])

    # Diagonals. Sources are bounceback_fix_dirs' read from fd via whole-
    # plane shifts; each hole entry is the stale plane at its own row.
    # dir 5 (+1,+1) <- 7: column (hole (5,-1,0) at the top wall row),
    # then the bottom wall row (hole (5,0,-1); the row wins corner (5,b,0))
    col5 = jnp.where(is_t1, stale[5][..., :, 0:1],
                     _shift(fd[7], -1, 0)[..., :, 0:1])
    out[5] = set_col0(out[5], col5)
    row5 = cat(_shift(fd[7], 0, -1)[..., :, :-1], stale[5][..., :, -1:])
    out[5] = jnp.where(is_b, row5, out[5])
    # dir 6 (-1,+1) <- 8: bottom row first (hole (6,0,0)), then the
    # column (hole (6,-1,-1); the column wins corner (6,b,NX-1))
    row6 = cat(stale[6][..., :, 0:1], _shift(fd[8], 0, 1)[..., :, 1:])
    out[6] = jnp.where(is_b, row6, out[6])
    col6 = jnp.where(is_t1, stale[6][..., :, -1:],
                     _shift(fd[8], -1, 0)[..., :, -1:])
    out[6] = set_colN(out[6], col6)
    # dir 7 (-1,-1) <- 5: column (hole (7,0,-1) at the bottom wall row),
    # then the top wall row (hole (7,-1,0); corner (7,t,NX-1) takes the
    # in-place reflect fd[5][t, -1] — the reference's serial winner)
    col7 = jnp.where(is_b1, stale[7][..., :, -1:],
                     _shift(fd[5], 1, 0)[..., :, -1:])
    out[7] = set_colN(out[7], col7)
    row7 = cat(stale[7][..., :, 0:1], _shift(fd[5], 0, 1)[..., :, 1:-1],
               fd[5][..., :, -1:])
    out[7] = jnp.where(is_t, row7, out[7])
    # dir 8 (+1,-1) <- 6: column (hole (8,0,0) at the bottom wall row),
    # then the top wall row (hole (8,-1,-1); the row wins corner (8,t,0))
    col8 = jnp.where(is_b1, stale[8][..., :, 0:1],
                     _shift(fd[6], 1, 0)[..., :, 0:1])
    out[8] = set_col0(out[8], col8)
    row8 = cat(_shift(fd[6], 0, -1)[..., :, :-1], stale[8][..., :, -1:])
    out[8] = jnp.where(is_t, row8, out[8])
    return out


def stream_bounceback(f: jnp.ndarray, stale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Push streaming with bounce-back walls on all four edges.

    f: (..., Q, NY, NX). `stale` supplies the values retained at the corner
    hole slots (the reference's recycled temp buffer — see
    _bounceback_gather_map); defaults to f itself. The same operator applies
    to the thermal populations g — there bounce-back is a zero-flux Neumann
    condition (reference: include/streaming.hpp:55).
    """
    holes = hole_values(f if stale is None else stale)
    return bounceback_from_periodic(stream_periodic(f), holes)


# ---------------------------------------------------------------------------
# Cavity: pull streaming + 3 bounce-back walls + moving lid (top row)
# ---------------------------------------------------------------------------

def stream_cavity(f: jnp.ndarray, u_lid_dyn: jnp.ndarray | float) -> jnp.ndarray:
    """Pull streaming with the lid-driven-cavity boundary handling.

    Replicates old codes/LBM_classic/LBM.cpp:105-159:
      * interior: f_new[y, x, i] = f[y-cy, x-cx, i]
      * left/right walls: reflect (1<-3, 8<-6, 5<-7) / (3<-1, 7<-5, 6<-8)
      * bottom wall: (2<-4, 5<-7, 6<-8)
      * top (moving lid): f_new[4] = f[2]; f_new[7] = f[5] + d5;
        f_new[8] = f[6] + d6 with d_k = -6 w_k rho_local (cx_k * u_lid_dyn)
        evaluated from the pre-streaming populations on the top row.
      * write order matters at corners: sides, then bottom, then top (the
        reference's separate omp-for loops run in that order) — the lid rows
        win the top corners.

    f: (Q, NY, NX); index y is the second axis (y=0 bottom, y=NY-1 top/lid).
    """
    dtype = f.dtype

    # interior pull: inverse shift of push => roll by +c (f[y-cy, x-cx])
    fn = jnp.stack(
        [
            jnp.roll(f[i], shift=(int(CY[i]), int(CX[i])), axis=(0, 1))
            for i in range(Q)
        ]
    )

    # left wall x=0: incoming +x directions reflect from their opposites
    fn = fn.at[1, :, 0].set(f[3, :, 0])
    fn = fn.at[8, :, 0].set(f[6, :, 0])
    fn = fn.at[5, :, 0].set(f[7, :, 0])
    # right wall x=NX-1
    fn = fn.at[3, :, -1].set(f[1, :, -1])
    fn = fn.at[7, :, -1].set(f[5, :, -1])
    fn = fn.at[6, :, -1].set(f[8, :, -1])
    # bottom wall y=0
    fn = fn.at[2, 0, :].set(f[4, 0, :])
    fn = fn.at[5, 0, :].set(f[7, 0, :])
    fn = fn.at[6, 0, :].set(f[8, 0, :])

    # top moving lid y=NY-1 (written last: wins the two top corners)
    from .cavity import lid_deltas, sum_dirs
    rho_top = sum_dirs([f[i, -1, :] for i in range(Q)])
    u = jnp.asarray(u_lid_dyn, dtype)
    d5, d6 = lid_deltas(rho_top, u)
    fn = fn.at[4, -1, :].set(f[2, -1, :])          # d2 = 0 since cx[2] = 0
    fn = fn.at[7, -1, :].set(f[5, -1, :] + d5)
    fn = fn.at[8, -1, :].set(f[6, -1, :] + d6)
    return fn
