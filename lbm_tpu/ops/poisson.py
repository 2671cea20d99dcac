"""Electrostatic Poisson solvers and E-field reconstruction.

Solves nabla^2 phi = -rho_q in lattice units each step, then
E = -grad phi by central differences (reference: src/poisson.cpp).

Solvers:
  * FFT  — spectral solve with the discrete 5-point eigenvalue
           4 (sin^2(pi kx/NX) + sin^2(pi ky/NY)) and the k=0 mode zeroed
           (zero-mean gauge), matching src/poisson.cpp:365-420. On TPU this
           is an on-device rfft2/irfft2 pair; under sharding XLA inserts the
           collective transpose.
  * GS   — red-black Gauss-Seidel. The functional form is exactly the C++
           sweep: red points (i+j even) update from black neighbors, then
           black points update from the fresh red values.
  * SOR  — same stencil, omega-blended update.
  * NPS  — 9-point stencil with the 4-color ordering
           color = 2*(i%2) + (j%2), sweeps in order 0,1,2,3.

Iterative solvers run under lax.while_loop with maxIter=5000 / tol=1e-8
(reference: src/poisson.cpp:13-14) and support both the Dirichlet (phi=0
walls, interior-only sweep) and periodic variants. Note the reference's
dispatcher always uses the Dirichlet sweeps — even under periodic BCs — and
its periodic sweeps are dead code (src/poisson.cpp:46-63); both behaviors
are available here behind CompatFlags.dirichlet_iterative_under_periodic.

phi persists across steps as part of the simulation state (warm start),
mirroring the reference's translation-unit-static phi (src/poisson.cpp:9).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Spectral solver
# ---------------------------------------------------------------------------

def _rfft2_packed(x: jnp.ndarray) -> jnp.ndarray:
    """rfft2 via packed-halves complex FFTs. Requires even NY and NX.

    XLA's TPU real-FFT path runs ~3-5x slower per byte than its complex FFT
    (measured on v5e at 4096^2: 2.5 ms vs 0.5 ms per x-axis pass), so pack
    the two real row-halves into one complex array, transform, and untangle
    with the standard Hermitian split. Exact real-FFT algebra — agrees with
    jnp.fft.rfft2 to roundoff. Re/im are kept split through the untangle
    (the axon TPU backend lacks some complex elementwise kernels, and split
    f32 math fuses better).
    """
    NY, NX = x.shape
    M, H = NY // 2, NX // 2 + 1
    z = jax.lax.complex(x[:M], x[M:])
    w = jnp.fft.fft(z, axis=1)
    wr, wi = jnp.real(w), jnp.imag(w)

    def revhead(a):  # a[:, (NX - k) % NX] for k = 0..H-1
        return jnp.concatenate([a[:, :1], jnp.flip(a[:, NX - H + 1:], 1)], 1)

    ar, ai = wr[:, :H], wi[:, :H]
    br, bi = revhead(wr), revhead(wi)
    # u = (w + conj(w_rev))/2 ; v = -i (w - conj(w_rev))/2
    ur, ui = 0.5 * (ar + br), 0.5 * (ai - bi)
    vr, vi = 0.5 * (ai + bi), 0.5 * (br - ar)
    hr = jnp.concatenate([ur, vr], axis=0)
    hi = jnp.concatenate([ui, vi], axis=0)
    return jnp.fft.fft(jax.lax.complex(hr, hi), axis=0)


def _irfft2_packed(h: jnp.ndarray, s: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of _rfft2_packed (jnp.fft.irfft2 equivalent, even dims)."""
    NY, NX = s
    M, H = NY // 2, NX // 2 + 1
    hy = jnp.fft.ifft(h, axis=0)
    hyr, hyi = jnp.real(hy), jnp.imag(hy)
    ur, ui, vr, vi = hyr[:M], hyi[:M], hyr[M:], hyi[M:]
    whr, whi = ur - vi, ui + vr                       # w head: u + i v

    def tail(a):  # a[:, NX - k] for k = H..NX-1
        return jnp.flip(a[:, 1:NX - H + 1], 1)

    wtr = tail(ur) + tail(vi)                         # conj(u) + i conj(v)
    wti = -tail(ui) + tail(vr)
    wr = jnp.concatenate([whr, wtr], axis=1)
    wi = jnp.concatenate([whi, wti], axis=1)
    z = jnp.fft.ifft(jax.lax.complex(wr, wi), axis=1)
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=0)


@functools.lru_cache(maxsize=8)
def _dft_mats(n: int, inverse: bool):
    """Split re/im f32 DFT matrices (the inverse carries the 1/n)."""
    k = np.arange(n)
    ang = (2.0 if inverse else -2.0) * np.pi / n
    w = np.exp(1j * ang * np.outer(k, k))
    if inverse:
        w = w / n
    return (np.ascontiguousarray(w.real.astype(np.float32)),
            np.ascontiguousarray(w.imag.astype(np.float32)))


# Hypothesis (round 3): a short leading axis could take the O(n^2) MXU DFT
# matmul instead of XLA's axis-0 FFT — 4 (n x n) @ (n x batch) transpose-free
# matmuls at ~1e-6 rel (6-pass f32 emulation). MEASURED NEGATIVE on v5e at
# 64x512x512 (scripts/ablate_fft3_zpass.py, in-process A/B): full solve
# 7.13 ms MXU vs 6.77 XLA — XLA's z-pass is already at matmul speed. Gate
# kept at 0 (off); the ablation script flips it for reproduction.
_DFT_MXU_MAX_N = 0


def _fft_axis0_mxu(h: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """DFT along axis 0 as split re/im MXU matmuls (complex64 only)."""
    Wr_, Wi_ = _dft_mats(h.shape[0], inverse)
    Wr, Wi = jnp.asarray(Wr_), jnp.asarray(Wi_)
    hr, hi = jnp.real(h), jnp.imag(h)

    def mm(M, x):
        return jnp.tensordot(M, x, axes=([1], [0]),
                             precision=jax.lax.Precision.HIGHEST)

    return jax.lax.complex(mm(Wr, hr) - mm(Wi, hi), mm(Wr, hi) + mm(Wi, hr))


def _fft_axis0(h: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    if h.dtype == jnp.complex64 and h.shape[0] <= _DFT_MXU_MAX_N:
        return _fft_axis0_mxu(h, inverse)
    return jnp.fft.ifft(h, axis=0) if inverse else jnp.fft.fft(h, axis=0)


def _rfft3_packed(x: jnp.ndarray) -> jnp.ndarray:
    """rfftn of a (NZ, NY, NX) real volume via packed-halves complex FFTs
    (even NZ and NX) — the 3-D generalization of _rfft2_packed, packing the
    two z-halves as re/im for the x-axis transform so the slow XLA TPU
    real-FFT path is never touched. Returns the (NZ, NY, NX//2+1) half
    spectrum, elementwise-equal to jnp.fft.rfftn to roundoff."""
    NZ, NY, NX = x.shape
    M, H = NZ // 2, NX // 2 + 1
    z = jax.lax.complex(x[:M], x[M:])
    w = jnp.fft.fft(z, axis=-1)
    wr, wi = jnp.real(w), jnp.imag(w)

    def revhead(a):  # a[..., (NX - k) % NX] for k = 0..H-1
        return jnp.concatenate(
            [a[..., :1], jnp.flip(a[..., NX - H + 1:], -1)], -1)

    ar, ai = wr[..., :H], wi[..., :H]
    br, bi = revhead(wr), revhead(wi)
    # u = (w + conj(w_rev))/2 = rfft_x(x[:M]); v = -i (w - conj(w_rev))/2
    ur, ui = 0.5 * (ar + br), 0.5 * (ai - bi)
    vr, vi = 0.5 * (ai + bi), 0.5 * (br - ar)
    hr = jnp.concatenate([ur, vr], axis=0)
    hi = jnp.concatenate([ui, vi], axis=0)
    h = jnp.fft.fft(jax.lax.complex(hr, hi), axis=-2)
    return _fft_axis0(h, inverse=False)


def _irfft3_packed(h: jnp.ndarray, s: Tuple[int, int, int]) -> jnp.ndarray:
    """Inverse of _rfft3_packed (jnp.fft.irfftn equivalent, even NZ/NX)."""
    NZ, NY, NX = s
    M, H = NZ // 2, NX // 2 + 1
    h = _fft_axis0(h, inverse=True)
    h = jnp.fft.ifft(h, axis=-2)
    hr, hi = jnp.real(h), jnp.imag(h)
    ur, ui, vr, vi = hr[:M], hi[:M], hr[M:], hi[M:]
    whr, whi = ur - vi, ui + vr                       # w head: u + i v

    def tail(a):  # a[..., NX - k] for k = H..NX-1
        return jnp.flip(a[..., 1:NX - H + 1], -1)

    wtr = tail(ur) + tail(vi)                         # conj(u) + i conj(v)
    wti = -tail(ui) + tail(vr)
    wr = jnp.concatenate([whr, wtr], axis=-1)
    wi = jnp.concatenate([whi, wti], axis=-1)
    zc = jnp.fft.ifft(jax.lax.complex(wr, wi), axis=-1)
    return jnp.concatenate([jnp.real(zc), jnp.imag(zc)], axis=0)


# Grids at or above this site count take the packed transform (at 2048^2 it
# saves ~22% of the solve, at 4096^2 ~36%); below it the plain rfft2 is
# already VMEM-resident and the pack/untangle passes aren't worth it.
_PACKED_FFT_MIN_SITES = 2048 * 2048


def solve_fft(rho_q: jnp.ndarray) -> jnp.ndarray:
    """Spectral solve of nabla^2 phi = -rho_q with periodic BCs.

    rho_q: (NY, NX) -> phi (NY, NX), zero-mean.
    """
    NY, NX = rho_q.shape
    dtype = rho_q.dtype
    use_packed = (NY % 2 == 0 and NX % 2 == 0
                  and NY * NX >= _PACKED_FFT_MIN_SITES)
    # FFT in f32 loses too much for the tiny charge densities of the golden
    # run; compute the transform in f32/f64 matching input dtype.
    if use_packed:
        rho_hat = _rfft2_packed(rho_q)      # (NY, NX//2+1)
    else:
        rho_hat = jnp.fft.rfft2(rho_q)      # (NY, NX//2+1)
    ky = np.fft.fftfreq(NY) * NY            # integer wavenumbers
    kx = np.arange(NX // 2 + 1)
    siny2 = np.sin(np.pi * ky / NY) ** 2    # (NY,)
    sinx2 = np.sin(np.pi * kx / NX) ** 2    # (NX//2+1,)
    denom = 4.0 * (siny2[:, None] + sinx2[None, :])
    inv = np.where(denom > 1e-15, 1.0 / np.maximum(denom, 1e-300), 0.0)
    phi_hat = rho_hat * jnp.asarray(inv, rho_hat.real.dtype)
    if use_packed:
        phi = _irfft2_packed(phi_hat, s=(NY, NX))
    else:
        phi = jnp.fft.irfft2(phi_hat, s=(NY, NX))
    return phi.astype(dtype)


def solve_fft_efield(rho_q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spectral solve with E computed in k-space; phi never materialized.

    The central-difference gradient (efield_periodic's stencil,
    src/poisson.cpp:589-607) has the exact k-space symbol
        Ex_hat[ky, kx] = -i sin(2 pi kx / NX) * phi_hat[ky, kx]
    (phi(x+1) - phi(x-1) multiplies phi_hat by 2i sin(2 pi k/N)), so both
    field components come straight from rho_hat. The two real fields are
    recovered in ONE complex inverse FFT2: after the y-axis inverse, each
    row of Wx/Wy is Hermitian in kx (Ex, Ey are real), so
    D = Wx + i Wy Hermitian-extended to full width inverts to
    z = Ex + i Ey.

    Algebraically identical to solve_fft + efield_periodic; rounding
    differs at transform roundoff (f64 <=1e-14, f32 a few ulps of the
    field scale — see tests/test_poisson.py).

    Cost accounting (v5e, 2048^2, measured in scripts/ablate_poisson.py):
    forward = 2 half-width complex passes, inverse = 2 full-width complex
    passes (two real outputs), vs the phi path's 2 half passes + roll
    traffic. Whether the saved rolls/materialization beat the extra
    half-pass is hardware-dependent — this function exists so the choice
    is measured, not assumed.
    """
    NY, NX = rho_q.shape
    dtype = rho_q.dtype
    H = NX // 2 + 1
    use_packed = (NY % 2 == 0 and NX % 2 == 0
                  and NY * NX >= _PACKED_FFT_MIN_SITES)
    rho_hat = _rfft2_packed(rho_q) if use_packed else jnp.fft.rfft2(rho_q)
    ky = np.fft.fftfreq(NY) * NY
    kx = np.arange(H)
    siny2 = np.sin(np.pi * ky / NY) ** 2
    sinx2 = np.sin(np.pi * kx / NX) ** 2
    denom = 4.0 * (siny2[:, None] + sinx2[None, :])
    inv = np.where(denom > 1e-15, 1.0 / np.maximum(denom, 1e-300), 0.0)
    # gradient symbols folded into the eigenvalue multiply
    sx = np.sin(2.0 * np.pi * kx / NX)[None, :] * inv    # (NY, H)
    sy = np.sin(2.0 * np.pi * ky / NY)[:, None] * inv    # (NY, H)
    rdt = rho_hat.real.dtype
    pr, pi_ = jnp.real(rho_hat), jnp.imag(rho_hat)
    sx = jnp.asarray(sx, rdt)
    sy = jnp.asarray(sy, rdt)
    # E_hat = -i s * phi_hat: re = s*im(phi), im = -s*re(phi)
    ex_hat = jax.lax.complex(sx * pi_, -(sx * pr))
    ey_hat = jax.lax.complex(sy * pi_, -(sy * pr))
    w = jnp.fft.ifft(jnp.stack([ex_hat, ey_hat]), axis=1)  # y-axis inverse
    wx, wy = w[0], w[1]
    d_head = wx + jax.lax.complex(-jnp.imag(wy), jnp.real(wy))  # wx + i wy
    # kx = H..NX-1: conj(wx[:, NX-kx]) + i conj(wy[:, NX-kx])
    tx = jnp.conj(jnp.flip(wx[:, 1:NX - H + 1], 1))
    ty = jnp.conj(jnp.flip(wy[:, 1:NX - H + 1], 1))
    d_tail = tx + jax.lax.complex(-jnp.imag(ty), jnp.real(ty))
    z = jnp.fft.ifft(jnp.concatenate([d_head, d_tail], axis=1), axis=1)
    return jnp.real(z).astype(dtype), jnp.imag(z).astype(dtype)


# ---------------------------------------------------------------------------
# Iterative solvers (red-black GS / SOR, 4-color 9-point)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _checker_masks(NX: int, NY: int, interior_only: bool) -> Tuple[np.ndarray, np.ndarray]:
    ii, jj = np.meshgrid(np.arange(NX), np.arange(NY))  # ii=x, jj=y; shape (NY, NX)
    red = ((ii + jj) % 2 == 0)
    black = ~red
    if interior_only:
        inside = (ii >= 1) & (ii < NX - 1) & (jj >= 1) & (jj < NY - 1)
        red &= inside
        black &= inside
    return red, black


@functools.lru_cache(maxsize=None)
def _four_color_masks(NX: int, NY: int, interior_only: bool) -> Tuple[np.ndarray, ...]:
    ii, jj = np.meshgrid(np.arange(NX), np.arange(NY))
    color = 2 * (ii % 2) + (jj % 2)
    masks = []
    for c in range(4):
        m = color == c
        if interior_only:
            m &= (ii >= 1) & (ii < NX - 1) & (jj >= 1) & (jj < NY - 1)
        masks.append(m)
    return tuple(masks)


def _nb5(phi: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 4 orthogonal neighbors with wraparound.

    For interior-only (Dirichlet) updates the wrapped edge values are never
    selected, so one roll-based form serves both variants.
    """
    return (
        jnp.roll(phi, 1, axis=1) + jnp.roll(phi, -1, axis=1)
        + jnp.roll(phi, 1, axis=0) + jnp.roll(phi, -1, axis=0)
    )


def _nb_diag(phi: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.roll(phi, (1, 1), axis=(0, 1)) + jnp.roll(phi, (1, -1), axis=(0, 1))
        + jnp.roll(phi, (-1, 1), axis=(0, 1)) + jnp.roll(phi, (-1, -1), axis=(0, 1))
    )


def _iterate(phi0, rho_q, sweep_fn, max_iter: int, tol: float):
    """lax.while_loop around one full sweep; stops on maxErr < tol."""
    dtype = phi0.dtype

    def cond(state):
        it, _, err = state
        return jnp.logical_and(it < max_iter, err >= tol)

    def body(state):
        it, phi, _ = state
        phi, err = sweep_fn(phi, rho_q)
        return it + 1, phi, err

    # run at least one sweep (C++ do-style loop always sweeps once)
    _, phi, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), phi0, jnp.asarray(jnp.inf, dtype))
    )
    return phi


def solve_gs(phi0, rho_q, *, periodic: bool, max_iter: int = 5000, tol: float = 1e-8,
             omega: float | None = None):
    """Red-black Gauss-Seidel (or SOR when omega is given)."""
    NY, NX = rho_q.shape
    red_np, black_np = _checker_masks(NX, NY, interior_only=not periodic)
    red = jnp.asarray(red_np)
    black = jnp.asarray(black_np)

    def half(phi, rho, mask):
        gs = 0.25 * (_nb5(phi) + rho)
        new = gs if omega is None else (1.0 - omega) * phi + omega * gs
        upd = jnp.where(mask, new, phi)
        err = jnp.max(jnp.where(mask, jnp.abs(upd - phi), 0.0))
        return upd, err

    def sweep(phi, rho):
        phi, e1 = half(phi, rho, red)
        phi, e2 = half(phi, rho, black)
        return phi, jnp.maximum(e1, e2)

    return _iterate(phi0, rho_q, sweep, max_iter, tol)


def solve_9point(phi0, rho_q, *, periodic: bool, max_iter: int = 5000, tol: float = 1e-8):
    """9-point stencil, 4-color Gauss-Seidel ordering."""
    NY, NX = rho_q.shape
    masks = [jnp.asarray(m) for m in _four_color_masks(NX, NY, interior_only=not periodic)]

    def sweep(phi, rho):
        err = jnp.zeros((), phi.dtype)
        for mask in masks:
            new = (4.0 * _nb5(phi) + _nb_diag(phi) + 6.0 * rho) / 20.0
            upd = jnp.where(mask, new, phi)
            err = jnp.maximum(err, jnp.max(jnp.where(mask, jnp.abs(upd - phi), 0.0)))
            phi = upd
        return phi, err

    return _iterate(phi0, rho_q, sweep, max_iter, tol)


# ---------------------------------------------------------------------------
# E = -grad phi
# ---------------------------------------------------------------------------

def efield_periodic(phi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central differences with periodic wrap (src/poisson.cpp:589-607)."""
    Ex = -0.5 * (jnp.roll(phi, -1, axis=1) - jnp.roll(phi, 1, axis=1))
    Ey = -0.5 * (jnp.roll(phi, -1, axis=0) - jnp.roll(phi, 1, axis=0))
    return Ex, Ey


def efield_neumann(phi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central differences on the interior, copy-to-edge Neumann closure
    (src/poisson.cpp:551-585). Edge fill order matters at the corners: the
    top/bottom rows are filled from row 1 / NY-2 first, then the left/right
    columns copy from columns 1 / NX-2 (including the corner cells)."""
    Ex = -0.5 * (jnp.roll(phi, -1, axis=1) - jnp.roll(phi, 1, axis=1))
    Ey = -0.5 * (jnp.roll(phi, -1, axis=0) - jnp.roll(phi, 1, axis=0))

    def close(E):
        E = E.at[0, :].set(E[1, :])
        E = E.at[-1, :].set(E[-2, :])
        E = E.at[:, 0].set(E[:, 1])
        E = E.at[:, -1].set(E[:, -2])
        return E

    return close(Ex), close(Ey)
