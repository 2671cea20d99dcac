"""Configuration dataclasses for the TPU plasma / cavity LBM engine.

The reference hard-codes all physics in main (reference:
src/main_plasma.cpp:16-51) and recompiles to change anything; here the same
knobs are plain dataclasses, and the five BASELINE.json configurations are
exposed as presets.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax.numpy as jnp

from .units import LatticeUnits, compute_lattice_units


class PoissonSolver(enum.Enum):
    """Field-solver choices (reference: include/poisson.hpp PoissonType)."""

    NONE = 0
    GS = 1    # Gauss-Seidel, red-black
    SOR = 2   # successive over-relaxation, red-black
    FFT = 3   # spectral (periodic only)
    NPS = 4   # 9-point stencil, 4-color


class BC(enum.Enum):
    """Streaming boundary conditions (reference: include/streaming.hpp BCType)."""

    PERIODIC = 0
    BOUNCE_BACK = 1


@dataclasses.dataclass(frozen=True)
class CompatFlags:
    """Replicate-or-fix switches for the reference's behavioral quirks.

    Defaults replicate the reference so golden-trajectory parity holds; each
    can be flipped to the "fixed" behavior (SURVEY.md section 7.1.7).
    """

    # NONE solver zeroes Ex/Ey on its first call, discarding the external
    # field after step 0 (reference: src/poisson.cpp:34-43). False keeps the
    # external field forever.
    none_solver_kills_external_field: bool = True

    # Under periodic BCs the reference dispatches the *Dirichlet* GS/SOR/NPS
    # sweeps (interior-only, phi=0 walls) instead of its dead periodic
    # variants (reference: src/poisson.cpp:46-63). False uses true periodic
    # sweeps.
    dirichlet_iterative_under_periodic: bool = True

    # UpdateMacro guards: zero out a cell when rho < 1e-10, zero the velocity
    # when the momentum sum equals +/-rho exactly, clamp rho_q < 1e-15 to 0
    # (reference: src/plasma.cpp:373-387,453). Always replicated; kept here
    # for visibility/testing.
    macro_guards: bool = True

    # Replicate the "Plasma debug" predecessor variant (old codes/Plasma
    # debug/plasma_debug.cpp) instead of the final src/ behavior:
    # (a) the momentum==+/-rho guard sets ux/uy to 0.01*cs2 (electrons) and
    #     1e-5*cs2 (ions) rather than 0 (plasma_debug.cpp:397-407,417-427);
    # (b) the E field is zeroed at the end of step 0 for every solver — a
    #     "pulsed" external field (plasma_debug.cpp:1558-1566).
    # Used by the C++ cross-validation fixtures (tests/fixtures/).
    debug_variant: bool = False


@dataclasses.dataclass(frozen=True)
class PlasmaConfig:
    """Three-population D2Q9 plasma configuration.

    Defaults are the reference golden run (src/main_plasma.cpp:16-51):
    200x200 grid, 200 steps, hydrogen ions, FFT Poisson, periodic BCs.
    """

    NX: int = 200
    NY: int = 200
    NZ: int = 0            # 0 => 2-D (D2Q9); >0 => 3-D column (D3Q19)
    nsteps: int = 200

    Z_ion: int = 1
    A_ion: int = 1
    n_e_SI: float = 1e11   # [m^-3]
    n_n_SI: float = 1e18   # [m^-3]
    T_e_SI: float = 1e4    # [K]
    T_i_SI: float = 300.0  # [K]
    T_n_SI: float = 300.0  # [K]
    Ex_SI: float = 1e-2    # [V/m]
    Ey_SI: float = 0.0     # [V/m]

    poisson: PoissonSolver = PoissonSolver.FFT
    bc: BC = BC.PERIODIC
    omega_sor: float = 1.8
    poisson_max_iter: int = 5000
    poisson_tol: float = 1e-8

    # BGK relaxation times, fixed (reference: src/collisions.cpp:6-7).
    tau_e: float = 5.0
    tau_i: float = 3.0
    tau_n: float = 1.0
    tau_ei: float = 6.0
    tau_en: float = 4.0
    tau_in: float = 2.0

    dtype: jnp.dtype = jnp.float32
    compat: CompatFlags = CompatFlags()

    # Compute backend for the collide stage: "jnp" (XLA-fused elementwise
    # chain) or "pallas" (single fused VMEM kernel; numerics-identical).
    backend: str = "jnp"

    # Run Pallas kernels in interpreter mode (CPU-testable step-level
    # composition; orders of magnitude slower — tests only).
    kernel_interpret: bool = False

    # Store the neutral mass populations as deltas from the uniform
    # background rho_n_init * w_i. Algebraically identical dynamics, but in
    # f32 it rescues the neutral velocity/thermal channel: the golden
    # scaling puts rho_n ~ 1.8e10 lattice units while |u_n| ~ 1e-8, so the
    # classic f32 moments lose the entire momentum signal to rounding and
    # T_n diverges (the reference's own fragility, SURVEY.md section
    # 7.3.4). Off by default to keep bitwise compatibility with the
    # classic path; recommended for f32 production runs.
    neutral_delta: bool = False

    # FFT Poisson engine: "xla" (jnp.fft packed transforms + roll E),
    # "pallas" (kernels/fft_tpu.py four-step permuted-spectrum solve with
    # E in k-space; requires both grid axes = power-of-two * 128), or
    # "auto". The pallas path agrees with the xla path to transform
    # roundoff (~3e-5 rel f32 at 2048^2) and does NOT materialize phi
    # (FFT needs no warm start; run_plasma reconstructs phi lazily for
    # checkpoints). It currently measures SLOWER than the xla path on
    # v5e (docs/STATUS.md round-3 ledger), so "auto" resolves to "xla";
    # sharded step constructors always force "xla" (a shard-local FFT
    # would be wrong).
    fft_engine: str = "auto"  # "auto" | "xla" | "pallas"

    # Engine for the ITERATIVE solvers (GS/SOR/NPS): "xla" runs
    # ops/poisson's roll-based sweeps (every sweep round-trips phi
    # through HBM), "pallas" runs the whole warm-started while_loop
    # VMEM-resident in one launch (kernels/poisson_iter.py; identical
    # sweep/stopping semantics — fused_multistep.solve_iter_val, the
    # same function the temporally-blocked windows run). "pallas" needs
    # the grid inside the kernel's whole-grid VMEM budget (~1024^2 f32).
    # "auto" resolves to the kernel for kernel backends + f32 +
    # VMEM-feasible grids on a real accelerator (measured v5e-1: GS/SOR
    # fused steps 1.7-2.2x, phi bitwise — docs/STATUS.md round-4 ledger,
    # scripts/measure_poisson_iter.py) and to "xla" otherwise; sharded
    # constructors always force "xla" (a shard-local sweep would be
    # wrong).
    iter_engine: str = "auto"  # "auto" | "xla" | "pallas"

    # Temporal blocking (fused backend, 2-D): run this many steps per
    # kernel launch with the whole (f, g) state resident in VMEM
    # (kernels/fused_multistep.py; feasible to ~256^2 f32 / ~304^2 bf16 —
    # check_vmem_multistep_plasma). NONE (either BC) and FFT+bounce-back
    # have no global stage, so the window is exact per-step math; FFT +
    # periodic — the GOLDEN configuration — runs the spectral solve
    # in-kernel as MXU DFT matmuls (exact algebra; f32 matmuls at
    # Precision.HIGHEST, ~1e-7 rel like the f32 FFT's own roundoff).
    # bf16 storage rounds once per window instead of every step.
    # 0 disables.
    multistep: int = 0

    # Population STORAGE precision for f and g (fields/phi keep `dtype`).
    # "bf16" halves the dominant HBM traffic (the step is bandwidth-bound:
    # 432 B/site -> 216) for ~1.5x throughput; all arithmetic still runs
    # in `dtype` in-register — only what crosses HBM is rounded. An opt-in
    # fast mode: per-step storage rounding is ~4e-3 relative, so use with
    # neutral_delta=True (the neutral channel stays sane) and expect
    # golden-trajectory drift like an f32-vs-f64 run, sooner.
    storage: str = "native"  # "native" | "bf16"

    def __post_init__(self):
        # every consumer tests `storage == "bf16"`, so a typo ("bfloat16",
        # "BF16") would silently run native mode — fail loudly instead
        if self.storage not in ("native", "bf16"):
            raise ValueError(f"storage must be 'native' or 'bf16', "
                             f"got {self.storage!r}")
        if self.backend not in ("jnp", "pallas", "fused"):
            raise ValueError(f"backend must be jnp|pallas|fused, "
                             f"got {self.backend!r}")
        if self.fft_engine not in ("auto", "xla", "pallas"):
            raise ValueError(f"fft_engine must be auto|xla|pallas, "
                             f"got {self.fft_engine!r}")
        if self.iter_engine not in ("auto", "xla", "pallas"):
            raise ValueError(f"iter_engine must be auto|xla|pallas, "
                             f"got {self.iter_engine!r}")
        if self.multistep:
            if self.multistep < 0:
                raise ValueError(f"multistep must be >= 0, "
                                 f"got {self.multistep}")
            if self.backend != "fused":
                raise ValueError("multistep is a fused-kernel mode")
            # every solver x BC combination is temporally blockable:
            # NONE (either BC) and FFT+bounce-back leave E constant;
            # FFT+periodic runs the spectral solve in-kernel (MXU DFT
            # matmuls); GS/SOR/NPS sweep in-kernel under a while_loop
            if self.NZ and self.poisson != PoissonSolver.NONE:
                # 3-D temporal blocking exists only as the multi-chip
                # K-slab ghost protocol (parallel/fused_sharded.
                # make_fused_sharded_multistep_rollout_3d), which needs a
                # window-constant E — the NONE solver
                raise ValueError("3-D multistep supports the NONE solver "
                                 "only (window-constant E)")
            if self.compat.debug_variant:
                raise ValueError("multistep is incompatible with "
                                 "debug_variant (jnp-only mode)")

    def units(self) -> LatticeUnits:
        return compute_lattice_units(
            Z_ion=self.Z_ion, A_ion=self.A_ion,
            n_e_SI=self.n_e_SI, n_n_SI=self.n_n_SI,
            T_e_SI=self.T_e_SI, T_i_SI=self.T_i_SI, T_n_SI=self.T_n_SI,
            Ex_SI=self.Ex_SI, Ey_SI=self.Ey_SI,
        )

    @property
    def taus(self) -> Tuple[float, float, float, float, float, float]:
        return (self.tau_e, self.tau_i, self.tau_n,
                self.tau_ei, self.tau_en, self.tau_in)


@dataclasses.dataclass(frozen=True)
class CavityConfig:
    """Single-population lid-driven cavity (reference: old codes/LBM_classic).

    Defaults are the Ghia-validated configuration
    (old codes/LBM_classic/main.cpp:7-11): Re=100, 129^2, u_lid=0.1, 10k steps.
    """

    NX: int = 129
    NY: int = 129
    nsteps: int = 10_000
    u_lid: float = 0.1
    Re: float = 100.0
    # Lid ramp duration: u_lid_dyn = u_lid * t / sigma for t < sigma
    # (old codes/LBM_classic/LBM.hpp:30, LBM.cpp:180).
    sigma: float = 10.0
    dtype: jnp.dtype = jnp.float32

    # Compute backend: "jnp" (XLA elementwise pipeline) or "fused" (single
    # HBM-pass Pallas collide+stream+macros kernel, bitwise-identical;
    # requires NY to be a multiple of 8 — the Ghia 129^2 grid is not).
    backend: str = "jnp"
    # Run the Pallas kernel in interpret mode (CPU testing).
    kernel_interpret: bool = False
    # Lean-macro mode (fused backend only): the stored macros are
    # mathematically redundant (always macros_guarded(f)), so the kernel
    # recomputes them in-register and traffics populations only — 72 B/site
    # f32 (same mathematical trajectory; agrees to fusion-context ulp)
    # or 36 B/site with bf16 storage (recomputed macros lose the stored
    # f32 macros' pre-rounding information: Ghia u error 5.5% vs 2.5%,
    # measured — see docs/STATUS.md before enabling bf16+lean).
    lean_macros: bool = False
    # Temporal blocking (fused backend only): run this many steps per
    # kernel launch with the WHOLE grid resident in VMEM — zero HBM
    # traffic between steps, one read+write of the populations per window.
    # Only feasible when the grid fits the VMEM budget
    # (kernels/fused_cavity.check_vmem_multistep: ~512^2 f32 / ~620^2
    # bf16); implies lean semantics (populations-only state). In bf16
    # storage the window rounds once at its final store instead of every
    # step — strictly fewer roundings than the per-step bf16 kernel.
    # 0 disables (the banded single-step kernels run).
    multistep: int = 0
    # Population storage: "native" keeps f in cfg.dtype; "bf16" stores f as
    # bfloat16 DEVIATIONS from the uniform background w_i (the lattice
    # background is exactly invariant under cavity streaming + bounce-back
    # since w5=w7 and w6=w8), with all arithmetic and the stored macros in
    # f32. Measured: Ghia errors identical to f32 (u 2.6% / v 1.2% at
    # 128^2/10k), mass drift ~1e-4; storing macros in bf16 or f plainly
    # (non-delta) degrades Ghia to 4-19% — rejected (docs/STATUS.md).
    storage: str = "native"

    # Stability-guard mode replicating old codes/LBM_classic/Stability:
    # if tau falls outside [0.5, 2.0], resize NY (and NX to match) to bring
    # tau back in range (LBM_f.cpp:31-53).
    stability_autoresize: bool = False

    def __post_init__(self):
        if self.backend not in ("jnp", "fused"):
            raise ValueError(
                f"cavity backend must be jnp|fused, got {self.backend!r}")
        if self.storage not in ("native", "bf16"):
            raise ValueError(
                f"cavity storage must be native|bf16, got {self.storage!r}")
        if self.storage == "bf16" and self.dtype != jnp.float32:
            raise ValueError("cavity bf16 storage computes in f32; set "
                             "dtype=float32 (f64 runs use native storage)")
        if self.lean_macros and self.backend != "fused":
            raise ValueError("lean_macros is a fused-kernel mode")
        if self.multistep:
            if self.backend != "fused":
                raise ValueError("multistep is a fused-kernel mode")
            if self.multistep < 0:
                raise ValueError(f"multistep must be >= 0, "
                                 f"got {self.multistep}")

    @property
    def tau(self) -> float:
        # tau = 3 nu + 1/2 with nu = u_lid * NY / Re
        # (old codes/LBM_classic/LBM.cpp:12).
        return 3.0 * (self.u_lid * self.NY / self.Re) + 0.5

    def with_stability_guard(self) -> "CavityConfig":
        """Return a config whose grid has been resized so tau is in [0.5, 2].

        Mirrors the Stability variant's constructor logic
        (old codes/LBM_classic/Stability/LBM_f.cpp:31-53): tau too small
        -> NY = Re*0.1/(3*u_lid); tau too large -> NY = Re*1.5/(3*u_lid).
        """
        tau = self.tau
        if 0.5 <= tau <= 2.0:
            return self
        if tau < 0.5:
            ny = int(self.Re * 0.1 / (3.0 * self.u_lid))
        else:
            ny = int(self.Re * 1.5 / (3.0 * self.u_lid))
        ny = max(ny, 2)
        return dataclasses.replace(self, NX=ny, NY=ny)


# ---------------------------------------------------------------------------
# BASELINE.json presets
# ---------------------------------------------------------------------------

def preset_golden_plasma() -> PlasmaConfig:
    """Config #1: 200x200, 200 steps, FFT+Periodic (the C++ golden run)."""
    return PlasmaConfig()


def preset_cavity_ghia() -> CavityConfig:
    """Config #2: Ghia-validated lid-driven cavity."""
    return CavityConfig()


def preset_plasma_1024() -> PlasmaConfig:
    """Config #3: 1024^2 plasma, on-device FFT Poisson, single chip."""
    return PlasmaConfig(NX=1024, NY=1024, nsteps=100)


def preset_plasma_4096() -> PlasmaConfig:
    """Config #4: 4096^2 plasma for the sharded multi-chip run."""
    return PlasmaConfig(NX=4096, NY=4096, nsteps=100)


def preset_plasma_3d(n: int = 64, nz: int = 64) -> PlasmaConfig:
    """Config #5 (stretch): D3Q19 3-D plasma column."""
    return PlasmaConfig(NX=n, NY=n, NZ=nz, nsteps=50)
