"""VMEM-resident per-step iterative Poisson solve (GS / SOR / NPS).

The jnp path (ops/poisson.solve_gs / solve_9point, the functional form
of src/poisson.cpp:90-142, 216-279, 429-483) runs every red-black /
4-color sweep as an XLA loop body whose phi round-trips HBM: ~14
whole-plane passes per sweep (4-8 rolls + selects + the max-err
reduction), so a warm-started solve doing tens-to-hundreds of sweeps is
pure HBM traffic. This kernel loads phi and rho_q into VMEM ONCE and
runs the entire while_loop there — the sweeps become VPU arithmetic on
resident planes, the only HBM traffic is one read of (phi0, rho_q) and
one write of phi.

The sweep/stopping semantics are fused_multistep.solve_iter_val — the
SAME function the temporally-blocked window kernel runs — which is the
exact functional form of the jnp path: identical mask orders (red then
black; 4 colors ascending), identical update algebra, identical
do-style while_loop (always sweeps once, stops on maxErr < tol or
max_iter). E is NOT computed in-kernel: the caller's jnp
efield_periodic / efield_neumann runs on the returned phi, so the E
code path is byte-identical to the jnp solver's and the kernel saves
two whole-plane VMEM outputs.

Wiring: models/plasma._solve_poisson routes GS/SOR/NPS through this
kernel when `cfg.iter_engine` admits it (default "auto": kernel
backends on VMEM-feasible grids; the jnp backend always keeps the XLA
path). Grids past the VMEM budget fall back to the jnp path — the
sweeps are global per iteration (red reads black's fresh values), so
unlike the collide+stream kernels there is no banded form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_multistep import solve_iter_val

# VMEM accounting, against the kernels' 100 MiB scoped limit (minus
# safety): 2 in + 1 out whole planes, double-buffered by Mosaic (x2),
# plus the sweep's live whole-plane temporaries (p / neighbor sum /
# new / upd / |upd-p| and the hoisted iota masks). 16 plane-equivalents
# is the same conservative style as check_vmem_multistep_plasma's
# pre-calibration estimate; admits 1024^2 f32 (64 MiB), rejects 2048^2.
# TODO(calibration): replace with a measured B/site once profiled on
# v5e like the bf16 multistep calibration (docs/STATUS.md round 4).
_PLANES = 16
_VMEM_BUDGET = (100 - 2) * 1024 * 1024


def check_vmem_iter(NY: int, NX: int, itemsize: int) -> bool:
    """True when the whole-grid solve kernel fits the scoped VMEM."""
    return _PLANES * NY * NX * itemsize <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def solve_iter_tpu(
    phi0: jnp.ndarray,    # (NY, NX) warm start
    rho_q: jnp.ndarray,   # (NY, NX)
    *,
    spec,                 # (kind, omega, max_iter, tol, interior_only)
    interpret: bool = False,
) -> jnp.ndarray:
    """One warm-started iterative solve; returns phi only (E is the
    caller's). spec is solve_iter_val's minus the trailing neumann
    element (pinned to None in-kernel)."""
    NY, NX = rho_q.shape
    if phi0.shape != (NY, NX):
        raise ValueError(f"phi0 {phi0.shape} vs rho_q {rho_q.shape}")
    dt = phi0.dtype
    if not check_vmem_iter(NY, NX, jnp.dtype(dt).itemsize):
        raise ValueError(
            f"{NY}x{NX} exceeds the iterative-solve kernel's whole-grid "
            f"VMEM budget (iter_engine='xla' falls back to the jnp path)")
    full_spec = tuple(spec) + (None,)

    def kernel(phi_ref, rho_ref, out_ref):
        phi, _, _ = solve_iter_val(rho_ref[:], phi_ref[:], full_spec)
        out_ref[:] = phi

    fld = pl.BlockSpec((NY, NX), lambda k: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[fld, fld],
        out_specs=fld,
        out_shape=jax.ShapeDtypeStruct((NY, NX), dt),
        # sweeps are data-dependent in count; bill the max_iter worst case
        # so the scheduler never assumes this launch is cheap
        cost_estimate=pl.CostEstimate(
            flops=int(30 * NY * NX) * max(int(spec[2]), 1),
            bytes_accessed=3 * NY * NX * jnp.dtype(dt).itemsize,
            transcendentals=0,
        ),
        # phi0 is dead after the load — write the result into its HBM
        # buffer (same in-place idiom as the fused step kernels)
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(phi0, rho_q.astype(dt))
