"""Multi-chip fused step: shard_map + ICI halo exchange + fused kernel.

The lattice is row-sharded over a 1-D device mesh (axis "dy"). Each step:

  1. every device ppermutes its edge 8-row strips of f, g, Ex, Ey to its
     y-neighbors (ring, periodic) — the only per-step neighbor traffic,
     O(NX) per device over ICI;
  2. each device runs the halo-variant fused collide+stream kernel on its
     shard (collide + full streaming in one VMEM pass; the halo strips are
     collided redundantly for the edge rows);
  3. the Poisson solve runs on the globally sharded rho_q under GSPMD
     (sharded FFT -> collective transpose; E-field central differences ->
     collective-permute halos), and the resulting E is consumed sharded.

This is the TPU-native replacement for the reference's OpenMP loop
decomposition (SURVEY.md section 2.3): OpenMP shared memory becomes ICI
neighbor exchange; the serial fraction (in-loop visualization) is gone.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PlasmaConfig, PoissonSolver
from ..kernels.fused_step import collide_stream_halo
from ..models.plasma import PlasmaState, _solve_poisson
from .mesh import AXIS_Y


def make_fused_sharded_step(
    cfg: PlasmaConfig,
    mesh: Mesh,
    interpret: bool | None = None,
) -> Callable[[PlasmaState], PlasmaState]:
    """Jitted sharded step using the fused kernel. Requires a 1-D (dy) mesh
    (full lattice width per device), periodic BC, and NY divisible by
    8 * n_devices."""
    if AXIS_Y not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Y}' axis")
    n_dev = mesh.shape[AXIS_Y]
    extra = [a for a in mesh.axis_names if a != AXIS_Y and mesh.shape[a] != 1]
    if extra:
        raise ValueError("fused sharded step is 1-D (dy) only; got "
                         f"nontrivial axes {extra}")
    if cfg.NY % (8 * n_dev):
        raise ValueError(f"NY={cfg.NY} must be divisible by 8*{n_dev}")
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("sharded fused step supports FFT/NONE Poisson")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb)

    pop_spec = P(None, None, AXIS_Y, None)
    fld_spec = P(AXIS_Y, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pop_spec, pop_spec, fld_spec, fld_spec),
             out_specs=(pop_spec, pop_spec, fld_spec),
             check_vma=False)  # pallas_call outputs carry no vma metadata
    def local_step(f, g, Ex, Ey):
        fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
        bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

        def xchg(a, rows, perm):
            return jax.lax.ppermute(a[..., rows, :], AXIS_Y, perm)

        up = [xchg(a, slice(-8, None), fwd) for a in (f, g, Ex, Ey)]
        dn = [xchg(a, slice(0, 8), bwd) for a in (f, g, Ex, Ey)]
        return collide_stream_halo(
            f, g, Ex, Ey, *up, *dn, interpret=interpret, **phys)

    def step(state: PlasmaState) -> PlasmaState:
        f, g, rho_q = local_step(state.f, state.g, state.Ex, state.Ey)
        Ex, Ey, phi = _solve_poisson(cfg, rho_q, state.phi,
                                     state.Ex, state.Ey)
        return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=phi,
                           step=state.step + 1)

    shardings = PlasmaState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(step, in_shardings=(shardings,), out_shardings=shardings)
