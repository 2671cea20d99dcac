"""Three-population plasma on a D3Q19 lattice (3-D column, stretch config).

Extends the 2-D physics (models/plasma.py) to three dimensions: the same
pairwise-BGK + Guo-forcing + DDF-thermal structure with the D3Q19 stencil,
periodic boundaries, and a 3-D spectral Poisson solve

    phi_hat = rho_hat / (4 (sin^2(pi kx/NX) + sin^2(pi ky/NY)
                             + sin^2(pi kz/NZ)))

with the k=0 mode zeroed — the direct generalization of the reference's
2-D eigenvalue (src/poisson.cpp:388-409). The thermal energy-loss term uses
Q=19 where the 2-D reference hard-codes Q=9.

State layout: (3, 19, NZ, NY, NX). The physics operators live in
ops/d3.py (direction-unrolled, factored polynomials, scalar stencil
constants — shared verbatim with the 3-D Pallas kernel, exactly like the
2-D ops/ <-> kernels/ split).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PlasmaConfig
from ..constants import D3Q19
from ..ops.d3 import (Macros3D, collide_species_dirs3, equilibrium_wpolys3,
                      update_macro3)

_Q = D3Q19.Q
_S = 3


class Plasma3DState(NamedTuple):
    f: jnp.ndarray    # (3, 19, NZ, NY, NX)
    g: jnp.ndarray
    Ex: jnp.ndarray   # (NZ, NY, NX)
    Ey: jnp.ndarray
    Ez: jnp.ndarray
    phi: jnp.ndarray
    step: jnp.ndarray


def init_state(cfg: PlasmaConfig) -> Plasma3DState:
    """Electrons/ions seeded in the center column (box in x-y spanning all
    z — a plasma column), neutrals everywhere; uniform external E field.
    Built ON-DEVICE (at 256^3 the f+g state is ~27 GB in f32 — host-side
    construction + tunnel transfer is a non-starter, cf. 2-D init)."""
    assert cfg.NZ > 0, "3-D config requires NZ > 0"
    u = cfg.units()
    NZ, NY, NX = cfg.NZ, cfg.NY, cfg.NX
    dtype = cfg.dtype

    @jax.jit
    def build():
        iy = jax.lax.broadcasted_iota(jnp.int32, (NZ, NY, NX), 1)
        ix = jax.lax.broadcasted_iota(jnp.int32, (NZ, NY, NX), 2)
        box = ((iy >= NY // 4 + 1) & (iy < (3 * NY) // 4)
               & (ix >= NX // 4 + 1) & (ix < (3 * NX) // 4)).astype(dtype)
        ones = jnp.ones((NZ, NY, NX), dtype)
        w = np.asarray(D3Q19.W)  # float64 on host, cast once
        # delta mode: f[2] holds deviations from rho_n_init * w_i, which is
        # exactly the uniform neutral IC -> deltas start at 0 (cf. 2-D init)
        rho_n_amp = 0.0 if cfg.neutral_delta else u.rho_n_init
        amp_f = np.stack([w * u.rho_e_init, w * u.rho_i_init,
                          w * rho_n_amp]).astype(dtype)
        amp_g = np.stack([w * u.T_e_init, w * u.T_i_init,
                          w * u.T_n_init]).astype(dtype)
        mask = jnp.stack([box, box, ones])           # (3, NZ, NY, NX)
        f = jnp.asarray(amp_f)[:, :, None, None, None] * mask[:, None]
        g = jnp.asarray(amp_g)[:, :, None, None, None] * mask[:, None]
        if cfg.storage == "bf16":
            f = f.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16)
        zero = jnp.zeros((NZ, NY, NX), dtype)
        return Plasma3DState(
            f=f, g=g,
            Ex=jnp.full((NZ, NY, NX), u.Ex_ext, dtype),
            Ey=jnp.full((NZ, NY, NX), u.Ey_ext, dtype),
            Ez=zero, phi=zero, step=jnp.zeros((), jnp.int32),
        )

    return build()


def _consts(dtype):
    cx = jnp.asarray(D3Q19.CX.astype(np.float64), dtype)[:, None, None, None]
    cy = jnp.asarray(D3Q19.CY.astype(np.float64), dtype)[:, None, None, None]
    cz = jnp.asarray(D3Q19.CZ.astype(np.float64), dtype)[:, None, None, None]
    w = jnp.asarray(D3Q19.W, dtype)[:, None, None, None]
    return cx, cy, cz, w


def _equilibrium(amp, ux, uy, uz, cs2, dtype):
    cx, cy, cz, w = _consts(dtype)
    u2 = ux * ux + uy * uy + uz * uz
    cu = cx * ux[None] + cy * uy[None] + cz * uz[None]
    inv = 1.0 / cs2
    return w * amp[None] * (1.0 + cu * inv + cu * cu * (0.5 * inv * inv)
                            - u2[None] * (0.5 * inv))


def update_macro(f, g, Ex, Ey, Ez, *, q_e, q_i, m_e, m_i,
                 neutral_ref=0.0) -> Macros3D:
    """Moments for observation/the step (delegates to the shared op)."""
    return update_macro3(f, g, Ex, Ey, Ez, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i,
                         neutral_ref=neutral_ref)


def collide(f, g, mac, Ex, Ey, Ez, *, taus, q_e, q_i, m_e, m_i, cs2, kb,
            neutral_ref=0.0, g_recip=None):
    """Triple-BGK + Guo + DDF thermal via the shared per-direction ops
    (ops/d3.py) — no materialized (19, NZ, NY, NX) equilibrium fields."""
    kw = dict(taus=taus, q_e=q_e, q_i=q_i, m_e=m_e, m_i=m_i, cs2=cs2, kb=kb,
              neutral_ref=neutral_ref, g_recip=g_recip)
    pair_polys = {
        p: equilibrium_wpolys3(mac.ux_pair[p], mac.uy_pair[p],
                               mac.uz_pair[p], cs2)
        for p in range(3)
    }
    f_out, g_out = [], []
    for s in range(_S):
        f_dirs, g_dirs = collide_species_dirs3(
            s, f[s], g[s], mac, Ex, Ey, Ez, pair_polys=pair_polys, **kw)
        f_out.append(jnp.stack(f_dirs))
        g_out.append(jnp.stack(g_dirs))
    return jnp.stack(f_out), jnp.stack(g_out)


def stream_periodic(f):
    parts = [
        jnp.roll(f[..., i, :, :, :],
                 shift=(int(D3Q19.CZ[i]), int(D3Q19.CY[i]), int(D3Q19.CX[i])),
                 axis=(-3, -2, -1))
        for i in range(_Q)
    ]
    return jnp.stack(parts, axis=-4)


def spectral_inv3d(NZ: int, NY: int, NX: int) -> np.ndarray:
    """1/eigenvalue of the discrete 3-D Laplacian on the rfft grid
    (k=0 mode zeroed) — the reference's 2-D eigenvalue generalized."""
    kz = np.fft.fftfreq(NZ) * NZ
    ky = np.fft.fftfreq(NY) * NY
    kx = np.arange(NX // 2 + 1)
    den = 4.0 * (np.sin(np.pi * kz / NZ)[:, None, None] ** 2
                 + np.sin(np.pi * ky / NY)[None, :, None] ** 2
                 + np.sin(np.pi * kx / NX)[None, None, :] ** 2)
    return np.where(den > 1e-15, 1.0 / np.maximum(den, 1e-300), 0.0)


# Volumes at or above this site count take the packed-halves transform
# (the z-halves packed as re/im for the x pass — XLA's TPU real-FFT path
# runs 3-5x slower per byte than its complex path, cf. ops/poisson.py's
# 2-D pair); below it the plain rfft chain is VMEM-resident anyway.
_PACKED_FFT3_MIN_SITES = 128 * 128 * 128


def solve_fft3d(rho_q):
    """3-D spectral Poisson solve, written as per-axis 1-D transforms.

    Equivalent to rfftn/irfftn; the per-axis form is required under GSPMD
    sharding — XLA's CPU fft thunk RET_CHECKs on the non-dim0-major layout
    the partitioner picks for the fused multi-axis rfftn (the per-axis
    chain partitions cleanly: local transforms + collective transposes).
    For lattices sharded along z use the transpose-scheduled variant in
    parallel/fused_sharded.py (XLA's sharded-axis FFT handler is broken).

    Big volumes route the real<->half-spectrum ends through the
    packed-halves pair (ops/poisson._rfft3_packed) — same algebra, complex
    passes only."""
    from ..ops.poisson import _irfft3_packed, _rfft3_packed

    NZ, NY, NX = rho_q.shape
    use_packed = (NZ % 2 == 0 and NX % 2 == 0
                  and NZ * NY * NX >= _PACKED_FFT3_MIN_SITES)
    inv = spectral_inv3d(NZ, NY, NX)
    if use_packed:
        rho_hat = _rfft3_packed(rho_q)
        phi_hat = rho_hat * jnp.asarray(inv, rho_hat.dtype)
        return _irfft3_packed(phi_hat, s=(NZ, NY, NX)).astype(rho_q.dtype)
    rho_hat = jnp.fft.rfft(rho_q, axis=-1)
    rho_hat = jnp.fft.fft(rho_hat, axis=-2)
    rho_hat = jnp.fft.fft(rho_hat, axis=-3)
    phi_hat = rho_hat * jnp.asarray(inv, rho_hat.dtype)
    phi_hat = jnp.fft.ifft(phi_hat, axis=-3)
    phi_hat = jnp.fft.ifft(phi_hat, axis=-2)
    phi = jnp.fft.irfft(phi_hat, n=NX, axis=-1)
    return phi.astype(rho_q.dtype)


def efield_periodic3d(phi):
    Ex = -0.5 * (jnp.roll(phi, -1, 2) - jnp.roll(phi, 1, 2))
    Ey = -0.5 * (jnp.roll(phi, -1, 1) - jnp.roll(phi, 1, 1))
    Ez = -0.5 * (jnp.roll(phi, -1, 0) - jnp.roll(phi, 1, 0))
    return Ex, Ey, Ez


def make_step(cfg: PlasmaConfig) -> Callable[[Plasma3DState], Plasma3DState]:
    from ..config import PoissonSolver

    u = cfg.units()
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("3-D model supports FFT/NONE Poisson")
    if getattr(cfg, "multistep", 0):
        # 3-D temporal blocking is the multi-chip K-slab protocol only
        # (one ghost exchange per K steps); single-device 3-D has nothing
        # to amortize — the per-step kernel is already one HBM pass
        raise ValueError(
            "3-D multistep is multi-chip only: use parallel/fused_sharded."
            "make_fused_sharded_multistep_rollout_3d")

    storage_bf16 = cfg.storage == "bf16"
    neutral_ref = u.rho_n_init if cfg.neutral_delta else 0.0
    if cfg.backend == "pallas":
        # the 3-D model has no separate collide-only kernel; a user asking
        # for 'pallas' (e.g. kernel-vs-jnp debugging) must not silently get
        # a different code path — match the 2-D model's explicit errors
        raise ValueError("3-D model backends are 'jnp' and 'fused' "
                         "(there is no separate 3-D pallas collide kernel)")
    use_fused = cfg.backend == "fused"
    use_split = use_panel = False
    if use_fused:
        import warnings

        from ..kernels.fused_panel3d import pick_panel3d
        from ..kernels.fused_split3d import check_vmem_split3d
        from ..kernels.fused_step3d import check_vmem3d
        itemsize = 2 if storage_bf16 else jnp.dtype(cfg.dtype).itemsize
        try:
            check_vmem3d(cfg.NY, cfg.NX, itemsize)
        except ValueError:
            # cross-section too wide for the single kernel: try the
            # mass/thermal split pair (fits ~2x the area), then the
            # y-paneled kernel (any width, 1-row redundant halo collide),
            # then jnp/XLA
            use_fused = False
            try:
                check_vmem_split3d(cfg.NY, cfg.NX, itemsize)
                use_split = True
            except ValueError:
                try:
                    pick_panel3d(cfg.NY, cfg.NX, itemsize)
                    use_panel = True
                except ValueError:
                    warnings.warn(
                        f"3-D cross-section {cfg.NY}x{cfg.NX} exceeds every "
                        f"fused kernel's VMEM budget; falling back to the "
                        f"jnp backend (~7x slower)", stacklevel=2)

    def step(state: Plasma3DState) -> Plasma3DState:
        if use_fused or use_split or use_panel:
            if use_panel:
                from ..kernels.fused_panel3d import collide_stream_panel3d
                f, g, rho_q = collide_stream_panel3d(
                    state.f, state.g, state.Ex, state.Ey, state.Ez,
                    taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e,
                    m_i=u.m_i, cs2=u.cs2, kb=u.kb,
                    interpret=cfg.kernel_interpret, neutral_ref=neutral_ref)
                return _poisson_and_pack(cfg, state, f, g, rho_q)
            if use_split:
                from ..kernels.fused_split3d import collide_stream_split3d
                f, g, rho_q = collide_stream_split3d(
                    state.f, state.g, state.Ex, state.Ey, state.Ez,
                    taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e,
                    m_i=u.m_i, cs2=u.cs2, kb=u.kb,
                    interpret=cfg.kernel_interpret, neutral_ref=neutral_ref)
                return _poisson_and_pack(cfg, state, f, g, rho_q)
            from ..kernels.fused_step3d import collide_stream3d
            f, g, rho_q = collide_stream3d(
                state.f, state.g, state.Ex, state.Ey, state.Ez,
                taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb, interpret=cfg.kernel_interpret,
                neutral_ref=neutral_ref)
            return _poisson_and_pack(cfg, state, f, g, rho_q)
        if storage_bf16:
            # storage rounding happens once per step at the final write
            state = state._replace(f=state.f.astype(cfg.dtype),
                                   g=state.g.astype(cfg.dtype))
        mac = update_macro(state.f, state.g, state.Ex, state.Ey, state.Ez,
                           q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                           neutral_ref=neutral_ref)
        f, g = collide(state.f, state.g, mac, state.Ex, state.Ey, state.Ez,
                       taus=cfg.taus, q_e=u.q_e, q_i=u.q_i,
                       m_e=u.m_e, m_i=u.m_i, cs2=u.cs2, kb=u.kb,
                       neutral_ref=neutral_ref,
                       g_recip=(lambda x: 1.0 / x) if storage_bf16 else None)
        f = stream_periodic(f)
        g = stream_periodic(g)
        if storage_bf16:
            f = f.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16)
        return _poisson_and_pack(cfg, state, f, g, mac.rho_q)

    return step


def _poisson_and_pack(cfg, state, f, g, rho_q) -> Plasma3DState:
    """Poisson dispatch + state packing shared by the jnp/fused/sharded
    steps (FFT periodic, or the NONE-solver quirk, src/poisson.cpp:34-43)."""
    from ..config import PoissonSolver

    if cfg.poisson == PoissonSolver.FFT:
        phi = solve_fft3d(rho_q)
        Ex, Ey, Ez = efield_periodic3d(phi)
    elif cfg.compat.none_solver_kills_external_field:
        z = jnp.zeros_like(state.Ex)
        Ex, Ey, Ez, phi = z, z, z, state.phi
    else:
        Ex, Ey, Ez, phi = state.Ex, state.Ey, state.Ez, state.phi
    return Plasma3DState(f=f, g=g, Ex=Ex, Ey=Ey, Ez=Ez, phi=phi,
                         step=state.step + 1)


def make_rollout(cfg: PlasmaConfig, n: Optional[int] = None):
    step = make_step(cfg)
    n_steps = cfg.nsteps if n is None else n

    def rollout(state):
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return rollout
