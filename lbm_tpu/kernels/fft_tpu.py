"""TPU-native spectral Poisson solve: four-step FFT in Pallas.

XLA's TPU FFT runs each 1-D pass ~6x off the VPU flop bound (measured
0.37 ms per half-size pass at 2048^2; scripts/ablate_poisson.py), making
the Poisson solve + E the largest serial cost of the fused bf16 step.
This module implements the 2-D solve as three panel-pipelined Pallas
kernels built on a PERMUTED-spectrum four-step transform (cf. the
round-2 MXU-DFT prototype's permuted-spectrum idea, scripts/prototypes/):

  per axis, length N = A * 128 (A a power of two):
    1. radix-2 Stockham DIF stages over the length-A sub-axis — coarse
       value slices/stacks only (the A-axis never touches lanes);
    2. twiddle multiply by an (A, 128) table;
    3. a 128-point DFT as a real 4-matmul complex contraction on the MXU
       (Precision.HIGHEST — f32 emulation is negligible at K = 128).
  The spectrum comes out PERMUTED: position [a, q] holds wavenumber
  k = A*q + a. Nothing un-permutes it: the Poisson eigenvalue and the
  k-space gradient use 1-D symbol vectors precomputed in the same
  permuted order, and the inverse transform consumes it directly.

  E comes out of ONE complex inverse: C_hat = phi_hat * (sy - i sx)
  (Ex = Re C, Ey = Im C — the exact k-space symbol of
  ops/poisson.efield_periodic's stencil, cf. ops/poisson.solve_fft_efield).

Kernels:
  K1  x-forward over row panels:   rho (NY, NX) -> Xr, Xi
  K2  y-forward + eig/grad + y-inverse over column panels
  K3  x-inverse over row panels -> (Ex, Ey)

The transform math lives in plain functions taking the twiddle tables as
jnp VALUES, so the identical code path runs under XLA on CPU (the test
oracle, solve_fft_efield_xla) and traced into the Pallas kernels (tables
arrive as kernel inputs — kernel bodies may not capture array constants).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


class AxisPlan(NamedTuple):
    """Host-precomputed constants for one axis of length N = A * 128."""

    N: int
    A: int
    stage_wr: np.ndarray   # (nstages, A//2) Stockham multipliers
    stage_wi: np.ndarray
    tw_r: np.ndarray       # (A, 128) four-step twiddle w_N^{c0*s}, [s, c0]
    tw_i: np.ndarray
    m_r: np.ndarray        # (128, 128) DFT matrix w_128^{c0*q}, [c0, q]
    m_i: np.ndarray


@functools.lru_cache(maxsize=None)
def make_axis_plan(N: int) -> AxisPlan:
    if N % _LANES or (N // _LANES) & (N // _LANES - 1):
        raise ValueError(f"axis length {N} is not (power of two) * 128")
    A = N // _LANES
    swr, swi = [], []
    l, m = A // 2, 1
    while l >= 1:
        j = np.arange(l)
        w = np.repeat(np.exp(-1j * np.pi * j / l), m)   # granularity m
        swr.append(w.real)
        swi.append(w.imag)
        l //= 2
        m *= 2
    # A == 1 (axis length exactly 128) has no Stockham stages: keep a
    # 1-element placeholder — _stages returns before reading it, and a
    # zero-size table would make an illegal zero-size VMEM block spec
    stage_wr = (np.stack(swr) if swr else np.zeros((1, 1)))
    stage_wi = (np.stack(swi) if swi else np.zeros((1, 1)))
    s = np.arange(A)[:, None]
    c0 = np.arange(_LANES)[None, :]
    tw = np.exp(-2j * np.pi * (s * c0) / N)
    mm = np.exp(-2j * np.pi
                * (np.arange(_LANES)[:, None] * np.arange(_LANES)[None, :])
                / _LANES)
    f32 = np.float32
    return AxisPlan(N, A, stage_wr.astype(f32), stage_wi.astype(f32),
                    tw.real.astype(f32), tw.imag.astype(f32),
                    mm.real.astype(f32), mm.imag.astype(f32))


def perm_indices(N: int) -> np.ndarray:
    """k held at flat spectrum position p = a*128 + q is perm[p] = A*q + a."""
    A = N // _LANES
    a, q = divmod(np.arange(N), _LANES)
    return A * q + a


class AxisTables(NamedTuple):
    """The plan's constants as on-device values (kernel refs or XLA).

    Stage/twiddle tables arrive PRE-SHAPED for their use site (Mosaic
    cannot reshape 1-D vectors to higher rank in-kernel): for the x-form
    stage_w* is (nstages, A//2, 1) and tw_* (A, 128); for the y-form
    stage_w* is (nstages, A//2, 1, 1) and tw_* (A, 128, 1).
    """

    stage_wr: jnp.ndarray
    stage_wi: jnp.ndarray
    tw_r: jnp.ndarray
    tw_i: jnp.ndarray
    m_r: jnp.ndarray
    m_i: jnp.ndarray


def _host_tables(plan: AxisPlan, y_form: bool):
    """The plan's numpy tables pre-shaped for the x- or y-form."""
    swr, swi, twr, twi, mr, mi = plan[2:]
    if y_form:
        swr = swr[:, :, None, None]
        swi = swi[:, :, None, None]
        twr = twr[:, :, None]
        twi = twi[:, :, None]
    else:
        swr = swr[:, :, None]
        swi = swi[:, :, None]
    return [swr, swi, twr, twi, mr, mi]


def _tables(plan: AxisPlan, y_form: bool = False) -> AxisTables:
    return AxisTables(*(jnp.asarray(t) for t in _host_tables(plan, y_form)))


def _stages(xr, xi, A: int, tb: AxisTables, axis: int, conj: bool):
    """Radix-2 Stockham DIF over the length-A dim `axis` (a value-op dim,
    never the lane dim): DFT_A (conj=False) or its unnormalized inverse.
    The stage weights must already broadcast against the sliced operand
    (see AxisTables)."""
    if A == 1:
        return xr, xi
    nd = xr.ndim

    def take(x, lo, hi):
        sl = [slice(None)] * nd
        sl[axis] = slice(lo, hi)
        return x[tuple(sl)]

    nstages = int(np.log2(A))
    l, m = A // 2, 1
    for st in range(nstages):
        wr = tb.stage_wr[st]
        wi = tb.stage_wi[st]
        if conj:
            wi = -wi
        a1r, a1i = take(xr, 0, l * m), take(xi, 0, l * m)
        a2r, a2i = take(xr, l * m, 2 * l * m), take(xi, l * m, 2 * l * m)
        sr, si = a1r + a2r, a1i + a2i
        dr, di = a1r - a2r, a1i - a2i
        tr = dr * wr - di * wi
        ti = dr * wi + di * wr

        def inter(s_, t_, l=l, m=m):
            sh = list(s_.shape)
            view = sh[:axis] + [l, m] + sh[axis + 1:]
            st_ = jnp.stack([s_.reshape(view), t_.reshape(view)],
                            axis=axis + 1)             # (..., l, 2, m, ...)
            return st_.reshape(sh[:axis] + [2 * l * m] + sh[axis + 1:])

        xr, xi = inter(sr, tr), inter(si, ti)
        l //= 2
        m *= 2
    return xr, xi


_HP = jax.lax.Precision.HIGHEST


def _dft128_lanes(xr, xi, tb: AxisTables, conj: bool):
    """128-point DFT over the LAST (lane) dim via 4 real MXU matmuls."""
    mr, mi = tb.m_r, (-tb.m_i if conj else tb.m_i)
    zr = jnp.dot(xr, mr, precision=_HP) - jnp.dot(xi, mi, precision=_HP)
    zi = jnp.dot(xr, mi, precision=_HP) + jnp.dot(xi, mr, precision=_HP)
    return zr, zi


def _dft128_dim(xr, xi, tb: AxisTables, dim: int, conj: bool):
    """128-point DFT over a non-lane dim; the contracted dim's replacement
    (q) lands as the LAST output dim."""
    mr, mi = tb.m_r, (-tb.m_i if conj else tb.m_i)
    dn = (((dim,), (0,)), ((), ()))

    def dg(x, m):
        return jax.lax.dot_general(x, m, dn, precision=_HP)

    zr = dg(xr, mr) - dg(xi, mi)
    zi = dg(xr, mi) + dg(xi, mr)
    return zr, zi


def fft_x_permuted(xr, xi, A: int, tb: AxisTables, conj: bool = False):
    """Length-N transform along the last dim of (..., N) -> permuted
    spectrum (position a*128+q holds k = A*q + a). conj=True runs the
    UNNORMALIZED inverse consuming the same permuted layout."""
    sh = xr.shape
    v = sh[:-1] + (A, _LANES)
    xr = xr.reshape(v)
    xi = xi.reshape(v)
    ax = xr.ndim - 2
    tw_r, tw_i = tb.tw_r, (-tb.tw_i if conj else tb.tw_i)
    if not conj:
        xr, xi = _stages(xr, xi, A, tb, axis=ax, conj=False)
        tr = xr * tw_r - xi * tw_i
        ti = xr * tw_i + xi * tw_r
        zr, zi = _dft128_lanes(tr, ti, tb, conj=False)
    else:
        zr, zi = _dft128_lanes(xr, xi, tb, conj=True)
        tr = zr * tw_r - zi * tw_i
        ti = zr * tw_i + zi * tw_r
        zr, zi = _stages(tr, ti, A, tb, axis=ax, conj=True)
    return zr.reshape(sh), zi.reshape(sh)


def fft_y_permuted(xr, xi, A: int, tb: AxisTables, conj: bool = False):
    """Length-N transform along dim 0 of (N, C) -> permuted spectrum along
    dim 0. Lane dim untouched; the 128-point DFT contracts the inner row
    dim, landing q last, then swaps back."""
    N, C = xr.shape
    xr = xr.reshape(A, _LANES, C)
    xi = xi.reshape(A, _LANES, C)
    tw_r = tb.tw_r                       # (A, 128, 1), pre-shaped
    tw_i = tb.tw_i * (-1.0 if conj else 1.0)
    if not conj:
        xr, xi = _stages(xr, xi, A, tb, axis=0, conj=False)
        tr = xr * tw_r - xi * tw_i
        ti = xr * tw_i + xi * tw_r
        zr, zi = _dft128_dim(tr, ti, tb, dim=1, conj=False)   # (A, C, 128)
        zr = jnp.swapaxes(zr, 1, 2)
        zi = jnp.swapaxes(zi, 1, 2)
    else:
        zr, zi = _dft128_dim(xr, xi, tb, dim=1, conj=True)
        zr = jnp.swapaxes(zr, 1, 2)
        zi = jnp.swapaxes(zi, 1, 2)
        tr = zr * tw_r - zi * tw_i
        ti = zr * tw_i + zi * tw_r
        zr, zi = _stages(tr, ti, A, tb, axis=0, conj=True)
    return zr.reshape(N, C), zi.reshape(N, C)


@functools.lru_cache(maxsize=None)
def grad_vectors(NY: int, NX: int):
    """Permuted-order 1-D symbol vectors for the eig+gradient multiply:
    (siny2, sy) over permuted ky rows, (sinx2, sx) over permuted kx
    columns. Returned in f64 (the sins and squares are computed at full
    precision on the host); callers cast once when building device
    inputs."""
    ky = perm_indices(NY).astype(np.float64)
    kx = perm_indices(NX).astype(np.float64)
    return (np.sin(np.pi * ky / NY) ** 2,
            np.sin(2.0 * np.pi * ky / NY),
            np.sin(np.pi * kx / NX) ** 2,
            np.sin(2.0 * np.pi * kx / NX))


def _apply_grad(zr, zi, siny2, sy, sinx2, sx, scale: float):
    """C_hat = phi_hat (sy - i sx), phi_hat = rho_hat * inv_eig * scale.

    Symbol inputs arrive PRE-SHAPED: y-vectors (NY, 1), x-vectors (1, NX);
    broadcast against the (NY, NX_panel) spectrum tile (no in-kernel
    vector reshapes — Mosaic restriction)."""
    denom = 4.0 * (siny2 + sinx2)
    inv = jnp.where(denom > 1e-15,
                    scale / jnp.where(denom > 1e-15, denom,
                                      jnp.ones_like(denom)),
                    jnp.zeros_like(denom))
    a = inv * sy                      # Re G
    b = inv * sx                      # -Im G  (G = a - i b)
    cr = zr * a + zi * b
    ci = zi * a - zr * b
    return cr, ci


def solve_fft_efield_xla(rho_q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The full permuted four-step solve as plain XLA ops (the oracle for
    the Pallas kernels; also runs on CPU)."""
    NY, NX = rho_q.shape
    px, py = make_axis_plan(NX), make_axis_plan(NY)
    tbx, tby = _tables(px), _tables(py, y_form=True)
    v4 = grad_vectors(NY, NX)
    sy2, sy = (jnp.asarray(v.reshape(NY, 1), jnp.float32) for v in v4[:2])
    sx2, sx = (jnp.asarray(v.reshape(1, NX), jnp.float32) for v in v4[2:])
    zr = rho_q.astype(jnp.float32)
    zi = jnp.zeros_like(zr)
    zr, zi = fft_x_permuted(zr, zi, px.A, tbx)
    zr, zi = fft_y_permuted(zr, zi, py.A, tby)
    cr, ci = _apply_grad(zr, zi, sy2, sy, sx2, sx, 1.0 / (NY * NX))
    cr, ci = fft_y_permuted(cr, ci, py.A, tby, conj=True)
    cr, ci = fft_x_permuted(cr, ci, px.A, tbx, conj=True)
    return cr.astype(rho_q.dtype), ci.astype(rho_q.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _axis_table_specs(plan: AxisPlan, y_form: bool):
    """BlockSpecs + device values for one axis' six pre-shaped tables."""
    def whole(arr):
        return pl.BlockSpec(arr.shape, lambda *_: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    arrs = _host_tables(plan, y_form)
    return [whole(a) for a in arrs], [jnp.asarray(a) for a in arrs]


def _pick_panel(N: int, other: int):
    """Panel extent along N so the kernel's live set fits scoped VMEM.

    Measured: ~30 panel-sized f32 planes live (in/out double-buffered +
    re/im Stockham intermediates + matmul operands); TR=512 at NX=2048
    needed 122.7 MB against the 100 MB limit, TR=256 fits."""
    for t in (512, 256, 128, 64, 32, 16, 8):
        if N % t == 0 and t * other * 4 * 30 < 88 * 1024 * 1024:
            return t
    raise ValueError(f"no feasible FFT panel extent for {N} x {other} "
                     f"(working set exceeds the scoped VMEM budget)")


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_fft_efield_tpu(rho_q: jnp.ndarray, *, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas four-step solve: rho_q (NY, NX) f32 -> (Ex, Ey).

    Numerically equivalent to ops/poisson.solve_fft + efield_periodic to
    transform roundoff (measured ~2e-6 rel f32 at 2048^2, same order as
    the packed-XLA path's own rounding).
    """
    NY, NX = rho_q.shape
    px, py = make_axis_plan(NX), make_axis_plan(NY)
    sy2, sy, sx2, sx = grad_vectors(NY, NX)
    f32 = jnp.float32

    # ---- K1: x-forward over row panels -> Xr, Xi ----
    TR = _pick_panel(NY, NX)
    specs_x, tabs_x = _axis_table_specs(px, y_form=False)

    def k1(rho_ref, *rest):
        (swr, swi, twr, twi, mr, mi, xr_ref, xi_ref) = rest
        tb = AxisTables(swr[:], swi[:], twr[:], twi[:], mr[:], mi[:])
        xr = rho_ref[:]
        zr, zi = fft_x_permuted(xr, jnp.zeros_like(xr), px.A, tb)
        xr_ref[:] = zr
        xi_ref[:] = zi

    row_blk = pl.BlockSpec((TR, NX), lambda k: (k, 0),
                           memory_space=pltpu.VMEM)
    xr, xi = pl.pallas_call(
        k1, grid=(NY // TR,),
        in_specs=[row_blk] + specs_x,
        out_specs=(row_blk, row_blk),
        out_shape=(jax.ShapeDtypeStruct((NY, NX), f32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rho_q.astype(f32), *tabs_x)

    # ---- K2: y-forward + grad + y-inverse over column panels ----
    TC = _pick_panel(NX, NY)
    specs_y, tabs_y = _axis_table_specs(py, y_form=True)
    vecs_y = [jnp.asarray(v.reshape(NY, 1), f32) for v in (sy2, sy)]
    vecs_x = [jnp.asarray(v.reshape(1, NX), f32) for v in (sx2, sx)]
    vy_spec = pl.BlockSpec((NY, 1), lambda k: (0, 0),
                           memory_space=pltpu.VMEM)
    vx_spec = pl.BlockSpec((1, TC), lambda k: (0, k),
                           memory_space=pltpu.VMEM)
    col_blk = pl.BlockSpec((NY, TC), lambda k: (0, k),
                           memory_space=pltpu.VMEM)
    scale = 1.0 / (NY * NX)

    def k2(xr_ref, xi_ref, *rest):
        (swr, swi, twr, twi, mr, mi, vy2, vy1, vx2, vx1,
         cr_ref, ci_ref) = rest
        tb = AxisTables(swr[:], swi[:], twr[:], twi[:], mr[:], mi[:])
        zr, zi = fft_y_permuted(xr_ref[:], xi_ref[:], py.A, tb)
        cr, ci = _apply_grad(zr, zi, vy2[:], vy1[:], vx2[:], vx1[:], scale)
        cr, ci = fft_y_permuted(cr, ci, py.A, tb, conj=True)
        cr_ref[:] = cr
        ci_ref[:] = ci

    wr, wi = pl.pallas_call(
        k2, grid=(NX // TC,),
        in_specs=[col_blk, col_blk] + specs_y
                 + [vy_spec, vy_spec, vx_spec, vx_spec],
        out_specs=(col_blk, col_blk),
        out_shape=(jax.ShapeDtypeStruct((NY, NX), f32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xr, xi, *tabs_y, *vecs_y, *vecs_x)

    # ---- K3: x-inverse over row panels -> Ex, Ey ----
    def k3(wr_ref, wi_ref, *rest):
        (swr, swi, twr, twi, mr, mi, ex_ref, ey_ref) = rest
        tb = AxisTables(swr[:], swi[:], twr[:], twi[:], mr[:], mi[:])
        cr, ci = fft_x_permuted(wr_ref[:], wi_ref[:], px.A, tb, conj=True)
        ex_ref[:] = cr
        ey_ref[:] = ci

    Ex, Ey = pl.pallas_call(
        k3, grid=(NY // TR,),
        in_specs=[row_blk, row_blk] + specs_x,
        out_specs=(row_blk, row_blk),
        out_shape=(jax.ShapeDtypeStruct((NY, NX), f32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wr, wi, *tabs_x)
    return Ex.astype(rho_q.dtype), Ey.astype(rho_q.dtype)


def supports(NY: int, NX: int) -> bool:
    """True when both axes are (power of two) * 128."""
    def ok(n):
        return n % _LANES == 0 and (n // _LANES) & (n // _LANES - 1) == 0
    return ok(NY) and ok(NX) and NY // _LANES >= 1 and NX // _LANES >= 1