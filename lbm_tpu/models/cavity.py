"""Single-population D2Q9 lid-driven cavity (the Ghia-validation workload).

Replicates the semantics of the classic solver (reference:
old codes/LBM_classic/LBM.cpp): loop order collide -> stream -> macro, pull
streaming, three bounce-back walls, moving lid with the ramp
u_lid_dyn = u_lid * t / sigma for t < sigma, and the rho<1e-10 macro guard.

The state carries (f, rho, ux, uy) exactly like the reference (macros are
updated AFTER streaming and consumed by the next step's collision, so they
are part of the state, unlike the plasma model where macros are recomputed).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CavityConfig
from ..constants import D2Q9
from ..ops.cavity import collide_dirs, macros_guarded
from ..ops.stream import stream_cavity

CS2 = 1.0 / 3.0


class CavityState(NamedTuple):
    f: jnp.ndarray    # (Q, NY, NX)
    rho: jnp.ndarray  # (NY, NX)
    ux: jnp.ndarray   # (NY, NX)
    uy: jnp.ndarray   # (NY, NX)
    step: jnp.ndarray  # () int32


def _w_bg(dtype):
    return jnp.asarray(D2Q9.W, dtype)[:, None, None]


def decode_f(cfg: CavityConfig, f: jnp.ndarray) -> jnp.ndarray:
    """Full populations in compute dtype. bf16 storage holds f as bfloat16
    deviations from the uniform background w_i (see CavityConfig.storage)."""
    if cfg.storage == "bf16":
        return f.astype(jnp.float32) + _w_bg(jnp.float32)
    return f


def encode_f(cfg: CavityConfig, f_full: jnp.ndarray) -> jnp.ndarray:
    """Storage representation of full populations (the step's single lossy
    rounding in bf16 mode)."""
    if cfg.storage == "bf16":
        return (f_full - _w_bg(jnp.float32)).astype(jnp.bfloat16)
    return f_full


def init_state(cfg: CavityConfig) -> CavityState:
    """rho=1, u=0, f = f_eq = w (old codes/LBM_classic/LBM.cpp:26-41).

    In bf16 storage mode the f deviation from the background is exactly
    zero at init, so the representation is lossless there."""
    dtype = cfg.dtype
    NY, NX = cfg.NY, cfg.NX
    if cfg.storage == "bf16":
        f = jnp.zeros((D2Q9.Q, NY, NX), jnp.bfloat16)
    else:
        f = jnp.broadcast_to(
            jnp.asarray(D2Q9.W, dtype)[:, None, None], (D2Q9.Q, NY, NX)
        ).copy()
    return CavityState(
        f=f,
        rho=jnp.ones((NY, NX), dtype),
        ux=jnp.zeros((NY, NX), dtype),
        uy=jnp.zeros((NY, NX), dtype),
        step=jnp.zeros((), jnp.int32),
    )


def macros_of(cfg: CavityConfig, f: jnp.ndarray):
    """(rho, ux, uy) recomputed from stored populations — the quantity the
    state's macro fields always equal (used by the lean-macro mode to
    materialize them on demand)."""
    ff = decode_f(cfg, f)
    return macros_guarded([ff[i] for i in range(D2Q9.Q)])


def _lid_speed(cfg: CavityConfig, step_count) -> jnp.ndarray:
    """u_lid * t / sigma ramp for t < sigma (LBM.cpp:180)."""
    t = step_count.astype(cfg.dtype)
    return jnp.where(t < cfg.sigma, cfg.u_lid / cfg.sigma * t, cfg.u_lid)


def make_step(cfg: CavityConfig) -> Callable[[CavityState], CavityState]:
    """One cavity step: collide -> pull-stream+BCs -> guarded macros.

    backend "jnp" runs the XLA elementwise pipeline; "fused" runs the
    single-HBM-pass Pallas kernel (kernels/fused_cavity.py) — bitwise
    identical by construction (both call the ops/cavity.py physics).
    """
    tau = cfg.tau
    backend = getattr(cfg, "backend", "jnp")

    if backend == "fused":
        from ..kernels.fused_cavity import (
            check_vmem_multistep, collide_stream_cavity,
            collide_stream_cavity_lean, collide_stream_cavity_multistep,
            collide_stream_cavity_multistep_banded, pick_multistep_bands)

        interpret = bool(getattr(cfg, "kernel_interpret", False))

        if getattr(cfg, "multistep", 0):
            # temporal blocking with k=1: same per-step math as the lean
            # kernel evaluated in the multistep program (make_rollout runs
            # the real K-step windows; a single step can't amortize).
            # Grids past the whole-grid VMEM budget go through the banded
            # variant with 1-deep ghosts.
            itemsize = (2 if cfg.storage == "bf16"
                        else jnp.dtype(cfg.dtype).itemsize)
            bands_1 = (None if check_vmem_multistep(cfg.NY, cfg.NX, itemsize)
                       else pick_multistep_bands(cfg.NY, cfg.NX, itemsize, 1))

            def step_ms(state: CavityState) -> CavityState:
                if bands_1 is None:
                    f = collide_stream_cavity_multistep(
                        state.f, state.step, tau=tau, k_steps=1,
                        u_lid=cfg.u_lid, sigma=cfg.sigma,
                        interpret=interpret)
                else:
                    f = collide_stream_cavity_multistep_banded(
                        state.f, state.step, tau=tau, k_steps=1,
                        u_lid=cfg.u_lid, sigma=cfg.sigma, bands=bands_1,
                        interpret=interpret)
                rho, ux, uy = macros_of(cfg, f)
                return CavityState(f=f, rho=rho, ux=ux, uy=uy,
                                   step=state.step + 1)

            return step_ms

        if getattr(cfg, "lean_macros", False):
            def step_lean(state: CavityState) -> CavityState:
                u_lid_dyn = _lid_speed(cfg, state.step)
                f = collide_stream_cavity_lean(
                    state.f, u_lid_dyn, tau=tau, interpret=interpret)
                rho, ux, uy = macros_of(cfg, f)
                return CavityState(f=f, rho=rho, ux=ux, uy=uy,
                                   step=state.step + 1)

            return step_lean

        def step_fused(state: CavityState) -> CavityState:
            u_lid_dyn = _lid_speed(cfg, state.step)
            f, rho, ux, uy = collide_stream_cavity(
                state.f, state.rho, state.ux, state.uy, u_lid_dyn,
                tau=tau, interpret=interpret)
            return CavityState(f=f, rho=rho, ux=ux, uy=uy,
                               step=state.step + 1)

        return step_fused

    if backend != "jnp":
        raise ValueError(f"cavity backend must be jnp|fused, got {backend!r}")

    def step(state: CavityState) -> CavityState:
        u_lid_dyn = _lid_speed(cfg, state.step)

        # collide against the equilibrium of the *current* macros
        ff = decode_f(cfg, state.f)
        f_dirs = collide_dirs([ff[i] for i in range(D2Q9.Q)],
                              state.rho, state.ux, state.uy, tau)

        # pull streaming + walls + moving lid
        f = stream_cavity(jnp.stack(f_dirs), u_lid_dyn)

        # macros with the rho<1e-10 guard (LBM.cpp:74-88)
        rho, ux, uy = macros_guarded([f[i] for i in range(D2Q9.Q)])

        return CavityState(f=encode_f(cfg, f), rho=rho, ux=ux, uy=uy,
                           step=state.step + 1)

    return step


def make_rollout(cfg: CavityConfig, n: Optional[int] = None):
    n_steps = cfg.nsteps if n is None else n

    if getattr(cfg, "multistep", 0) and cfg.backend == "fused":
        # temporal blocking: K steps per kernel launch, whole grid
        # VMEM-resident (kernels/fused_cavity.collide_stream_cavity_multistep)
        # — or, past the whole-grid VMEM budget, K-deep-ghost row bands
        # through the gated kernel (collide_stream_cavity_multistep_banded)
        from ..kernels.fused_cavity import (
            check_vmem_multistep, collide_stream_cavity_multistep,
            collide_stream_cavity_multistep_banded, pick_multistep_bands)

        interpret = bool(getattr(cfg, "kernel_interpret", False))
        tau = cfg.tau
        K = min(int(cfg.multistep), max(n_steps, 1))
        full, rem = divmod(n_steps, K)
        itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
        bands = None
        if not check_vmem_multistep(cfg.NY, cfg.NX, itemsize):
            bands = pick_multistep_bands(cfg.NY, cfg.NX, itemsize, K)
            if bands is None:
                raise ValueError(
                    f"multistep K={K} at {cfg.NY}x{cfg.NX}: no band split "
                    f"fits the kernel's VMEM budget (smaller K)")

        def window(f, t, k):
            if bands is None:
                f = collide_stream_cavity_multistep(
                    f, t, tau=tau, k_steps=k, u_lid=cfg.u_lid,
                    sigma=cfg.sigma, interpret=interpret)
            else:
                f = collide_stream_cavity_multistep_banded(
                    f, t, tau=tau, k_steps=k, u_lid=cfg.u_lid,
                    sigma=cfg.sigma, bands=bands, interpret=interpret)
            return f, t + k

        def rollout(state: CavityState) -> CavityState:
            f, t = state.f, state.step
            if full:
                def body(c, _):
                    return window(*c, K), None
                (f, t), _ = jax.lax.scan(body, (f, t), None, length=full)
            if rem:
                f, t = window(f, t, rem)
            rho, ux, uy = macros_of(cfg, f)
            return CavityState(f=f, rho=rho, ux=ux, uy=uy, step=t)

        return rollout

    if getattr(cfg, "lean_macros", False) and cfg.backend == "fused":
        # lean mode: carry only (f, step) through the scan — a full-state
        # carry would materialize the (redundant) macros every iteration,
        # paying the bytes the mode exists to avoid — and reconstruct the
        # macros once at the end.
        from ..kernels.fused_cavity import collide_stream_cavity_lean

        interpret = bool(getattr(cfg, "kernel_interpret", False))
        tau = cfg.tau

        def rollout(state: CavityState) -> CavityState:
            def body(c, _):
                f, t = c
                f = collide_stream_cavity_lean(
                    f, _lid_speed(cfg, t), tau=tau, interpret=interpret)
                return (f, t + 1), None
            (f, t), _ = jax.lax.scan(body, (state.f, state.step), None,
                                     length=n_steps)
            rho, ux, uy = macros_of(cfg, f)
            return CavityState(f=f, rho=rho, ux=ux, uy=uy, step=t)

        return rollout

    step = make_step(cfg)

    def rollout(state: CavityState) -> CavityState:
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return rollout


# ---------------------------------------------------------------------------
# Ghia, Ghia & Shin (1982) reference data, Re=100, 129x129 grid.
# Table I (u through vertical centerline) and Table II (v through horizontal
# centerline). Public benchmark values (y/x in cavity units, lid at y=1).
# ---------------------------------------------------------------------------

GHIA_Y = np.array([
    0.0000, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531,
    0.5000, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 0.9766, 1.0000,
])
GHIA_U_RE100 = np.array([
    0.00000, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150, -0.15662,
    -0.21090, -0.20581, -0.13641, 0.00332, 0.23151, 0.68717, 0.73722,
    0.78871, 0.84123, 1.00000,
])
GHIA_X = np.array([
    0.0000, 0.0625, 0.0703, 0.0781, 0.0938, 0.1563, 0.2266, 0.2344,
    0.5000, 0.8047, 0.8594, 0.9063, 0.9453, 0.9531, 0.9609, 0.9688, 1.0000,
])
GHIA_V_RE100 = np.array([
    0.00000, 0.09233, 0.10091, 0.10890, 0.12317, 0.16077, 0.17507, 0.17527,
    0.05454, -0.24533, -0.22445, -0.16914, -0.10313, -0.08864, -0.07391,
    -0.05906, 0.00000,
])


def centerline_profiles(state: CavityState, u_lid: float):
    """(y, u/u_lid at x-center), (x, v/u_lid at y-center) for Ghia comparison."""
    NY, NX = state.ux.shape
    xc, yc = NX // 2, NY // 2
    y = np.arange(NY) / (NY - 1)
    x = np.arange(NX) / (NX - 1)
    u_prof = np.asarray(state.ux[:, xc]) / u_lid
    v_prof = np.asarray(state.uy[yc, :]) / u_lid
    return (y, u_prof), (x, v_prof)
