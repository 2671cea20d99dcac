"""Temporally-blocked plasma kernel: K whole steps per launch, NONE solver.

The NONE-solver configuration (reference: src/poisson.cpp:34-43 — the
reference's own benchmark CSV carries hundreds of NONE+Periodic rows,
e.g. 200x200/100 steps 7,331->3,627 ms over 1..9 cores, BASELINE.md) has
no global stage: E is constant across steps (the compat quirk zeroes it
at the end of every solve call; without the quirk it keeps the external
value). Every remaining stage — moments, 18 equilibria, triple-BGK +
Guo + DDF thermal, periodic push streaming — is local, so for grids whose
whole (f, g) state fits VMEM the entire K-step march runs inside ONE
kernel launch with zero HBM traffic between steps (the same temporal
blocking as kernels/fused_cavity.collide_stream_cavity_multistep, which
measured 23-34 GLUPS at 128^2-512^2 vs the banded kernels' launch-bound
4-12).

Per-step math is the fused band kernel's exactly (the shared ops from
lbm_tpu.ops on whole-grid values instead of bands); streaming is a
whole-plane periodic roll on loaded values (arbitrary offsets are legal
on values; only ref slices need 8-row alignment).

Field semantics inside a window starting from state E: step 1 collides
with E (the state's field), and with the compat quirk on every later
step collides with 0 — exactly the per-step dispatch of
models/plasma._solve_poisson for PoissonSolver.NONE. The caller zeroes
the state's E after the window (quirk) like the per-step path does.

bf16 storage: the window decodes to f32 once, marches K steps in f32,
and rounds ONCE at the final store — strictly fewer roundings than the
per-step bf16 kernel (a separate, documented trajectory; same contract
as the cavity multistep mode). Neutral-delta layout passes through
unchanged (the ops are written in delta form via neutral_ref).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import D2Q9
from ..ops.collide import collide_species_dirs
from ..ops.equilibrium import equilibrium_wpolys
from ..ops.macros import update_macro
from ..ops.stream import HOLE_SLOTS, bounceback_fix_dirs

_CX = [int(c) for c in D2Q9.CX]
_CY = [int(c) for c in D2Q9.CY]
_Q = D2Q9.Q
_S = 3


def _roll2(a: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """Periodic push shift on a loaded (NY, NX) value:
    out[y, x] = a[y - sy, x - sx] (jnp.roll semantics)."""
    if sx:
        a = jnp.concatenate((a[:, -sx:], a[:, :-sx]), axis=1)
    if sy:
        a = jnp.concatenate((a[-sy:], a[:-sy]), axis=0)
    return a


def _corner11(v: jnp.ndarray, y: int, x: int) -> jnp.ndarray:
    """A (1, 1) STATIC corner slice of a loaded plane (y, x in {0, -1});
    scalar extractions from values are fragile under Mosaic — 2-D slices
    broadcast fine."""
    return v[(slice(0, 1) if y == 0 else slice(-1, None)),
             (slice(0, 1) if x == 0 else slice(-1, None))]


def check_vmem_multistep_plasma(NY: int, NX: int, itemsize: int,
                                budget: int = 90 * 1024 * 1024) -> bool:
    """Whole-state VMEM feasibility: f+g in/out blocks, the f32 working
    scratch pair, and the macro/equilibrium live set (~80 planes)."""
    planes = _S * _Q
    need = (
        2 * 2 * planes * NY * NX * itemsize  # f+g, in + out
        + 2 * planes * NY * NX * 4           # f32 working scratch pair
        + 80 * NY * NX * 4                   # mac + live temporaries
    )
    return need < budget


def _make_kernel(params, k_steps, kill_field, dt_store=None, bounce=False):
    def one_step(wf, wg, Ex, Ey):
        """One full plasma step on the scratch state (macros -> equilibria
        -> collide -> periodic push-stream [-> bounce-back edge fixups]),
        species-sequential to bound the live plane set."""
        mac = update_macro(wf[:], wg[:], Ex, Ey,
                           q_e=params["q_e"], q_i=params["q_i"],
                           m_e=params["m_e"], m_i=params["m_i"],
                           neutral_ref=params["neutral_ref"])
        pair_polys = {
            p: equilibrium_wpolys(mac.ux_pair[p], mac.uy_pair[p],
                                  params["cs2"])
            for p in range(3)
        }
        for s in range(_S):
            fs = wf[s] if bounce else None  # pre-collision (hole staleness)
            f_dirs, g_dirs = collide_species_dirs(
                s, wf[s], wg[s], mac, Ex, Ey,
                taus=params["taus"], q_e=params["q_e"], q_i=params["q_i"],
                m_e=params["m_e"], m_i=params["m_i"],
                cs2=params["cs2"], kb=params["kb"], pair_polys=pair_polys,
                neutral_ref=params["neutral_ref"],
                g_recip=(lambda x: pl.reciprocal(x, approx=True))
                if dt_store is not None else None)
            # push streaming: temp[y+cy, x+cx] = f[y, x] (periodic wrap)
            f_out = [_roll2(f_dirs[q], _CY[q], _CX[q]) for q in range(_Q)]
            g_out = [_roll2(g_dirs[q], _CY[q], _CX[q]) for q in range(_Q)]
            if bounce:
                # the reference's recycled temp buffers leak stale values
                # into the 8 corner holes: pre-collision f for the f pass,
                # post-collision f for the g pass — species 2's classic
                # leak gets the delta background added back
                # (models/plasma._g_holes_with_background)
                f_holes = [_corner11(fs[i], y, x) for (i, y, x) in HOLE_SLOTS]
                bg = params["neutral_ref"] if s == 2 else 0.0
                g_holes = [
                    _corner11(f_dirs[i], y, x) + bg * float(D2Q9.W[i])
                    for (i, y, x) in HOLE_SLOTS]
                f_out = bounceback_fix_dirs(f_out, f_dirs, f_holes)
                g_out = bounceback_fix_dirs(g_out, g_dirs, g_holes)
            for q in range(_Q):
                wf[s, q] = f_out[q]
                wg[s, q] = g_out[q]

    def kernel(f_ref, g_ref, ex_ref, ey_ref, fo_ref, go_ref, wf, wg):
        cdt = wf.dtype
        wf[:] = f_ref[:].astype(cdt)
        wg[:] = g_ref[:].astype(cdt)
        Ex = ex_ref[:]
        Ey = ey_ref[:]

        # step 1 collides with the state's field; with the quirk on, the
        # NONE "solve" zeroed E at the end of every previous step, so all
        # later steps in the window see 0 (src/poisson.cpp:34-43)
        one_step(wf, wg, Ex, Ey)
        if k_steps > 1:
            if kill_field:
                Ex = jnp.zeros_like(Ex)
                Ey = jnp.zeros_like(Ey)

            def body(_, carry):
                one_step(wf, wg, Ex, Ey)
                return carry

            jax.lax.fori_loop(1, k_steps, body, 0)

        fo_ref[:] = wf[:].astype(fo_ref.dtype)
        go_ref[:] = wg[:].astype(go_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("taus", "q_e", "q_i", "m_e", "m_i", "cs2", "kb",
                     "neutral_ref", "k_steps", "kill_field", "bounce",
                     "interpret"))
def collide_stream_multistep(
    f: jnp.ndarray,    # (3, Q, NY, NX)
    g: jnp.ndarray,
    Ex: jnp.ndarray,   # (NY, NX) — constant across the window
    Ey: jnp.ndarray,
    *,
    taus,
    q_e: float, q_i: float, m_e: float, m_i: float,
    cs2: float, kb: float,
    neutral_ref: float = 0.0,
    k_steps: int,
    kill_field: bool = True,
    bounce: bool = False,
    interpret: bool = False,
):
    """k_steps full plasma steps in one kernel launch: NONE solver (either
    BC) or the FFT-under-bounce-back no-op solve (src/poisson.cpp:76-77
    returns without solving, so E is constant across the window —
    kill_field=False). bounce=True streams with wall bounce-back (edge
    fixups on the periodic rolls incl. the corner-hole staleness quirks,
    ops/stream.bounceback_fix_dirs). Returns (f_new, g_new); E handling is
    the caller's (the quirk zeroes it after any step)."""
    S, Qd, NY, NX = f.shape
    assert (S, Qd) == (_S, _Q)
    dt = f.dtype
    cdt = jnp.float32 if dt == jnp.bfloat16 else dt
    if NY % 8:
        raise ValueError(f"NY={NY} must be divisible by 8")
    if not check_vmem_multistep_plasma(NY, NX, jnp.dtype(dt).itemsize):
        raise ValueError(
            f"{NY}x{NX} exceeds the plasma multistep kernel's whole-state "
            f"VMEM budget (use the banded kernels)")
    if k_steps < 1:
        raise ValueError("k_steps must be >= 1")

    params = dict(taus=tuple(taus), q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                  cs2=cs2, kb=kb, neutral_ref=neutral_ref)
    kernel = _make_kernel(params, int(k_steps), bool(kill_field),
                          dt_store=(dt if dt == jnp.bfloat16 else None),
                          bounce=bool(bounce))
    pop = pl.BlockSpec((_S, _Q, NY, NX), lambda k: (0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    fld = pl.BlockSpec((NY, NX), lambda k: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pop, pop, fld, fld],
        out_specs=(pop, pop),
        out_shape=(jax.ShapeDtypeStruct(f.shape, dt),
                   jax.ShapeDtypeStruct(g.shape, dt)),
        scratch_shapes=[
            pltpu.VMEM((_S, _Q, NY, NX), cdt),
            pltpu.VMEM((_S, _Q, NY, NX), cdt),
        ],
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=int(1500 * NY * NX) * int(k_steps),
            bytes_accessed=4 * _S * _Q * NY * NX * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f, g, Ex.astype(cdt), Ey.astype(cdt))
