"""GSPMD sharding of the plasma/cavity state and step.

Strategy (round 1): single-controller jit with NamedSharding annotations on
the state — the (NY, NX) lattice dims are sharded over the (dy, dx) mesh;
species/direction axes are replicated dims of locally-owned data. XLA then
partitions every operator:

  * streaming rolls      -> local dynamic-slices + collective-permute of the
                            1-cell boundary lanes over ICI
  * elementwise collide  -> fully local
  * rfft2 Poisson        -> sharded FFT with a collective transpose
  * while_loop max-error -> all-reduce per sweep

The hand-scheduled shard_map + ppermute halo-exchange path (tighter comm
control, runs the fused Pallas kernels) lives in fused_sharded.py; this
module is the simpler GSPMD baseline that works with every backend/BC.
"""
from __future__ import annotations

import dataclasses as _dc
from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CavityConfig, PlasmaConfig
from ..models.plasma import PlasmaState, make_step
from .mesh import AXIS_X, AXIS_Y


def state_shardings(mesh: Mesh) -> PlasmaState:
    """A PlasmaState-shaped pytree of NamedShardings (lattice-sharded)."""
    pop = NamedSharding(mesh, P(None, None, AXIS_Y, AXIS_X))   # f, g
    field = NamedSharding(mesh, P(AXIS_Y, AXIS_X))             # Ex, Ey, phi
    scalar = NamedSharding(mesh, P())
    return PlasmaState(f=pop, g=pop, Ex=field, Ey=field, phi=field, step=scalar)


def shard_state(state: PlasmaState, mesh: Mesh) -> PlasmaState:
    """Place an existing state onto the mesh."""
    sh = state_shardings(mesh)
    return jax.tree.map(jax.device_put, state, sh)


def make_sharded_step(
    cfg: PlasmaConfig,
    mesh: Mesh,
    donate: bool = True,
) -> Callable[[PlasmaState], PlasmaState]:
    """Jitted single step with lattice-sharded inputs/outputs."""
    sh = state_shardings(mesh)
    # solves must be the partitionable XLA paths under GSPMD (a pallas
    # FFT or VMEM-resident iterative sweep would run shard-local)
    cfg = _dc.replace(cfg, fft_engine="xla", iter_engine="xla")
    step = make_step(cfg)
    return jax.jit(
        step,
        in_shardings=(sh,),
        out_shardings=sh,
        donate_argnums=(0,) if donate else (),
    )


def validate_grid(cfg: PlasmaConfig, mesh: Mesh) -> None:
    ny, nx = mesh.devices.shape
    if cfg.NY % ny or cfg.NX % nx:
        raise ValueError(
            f"grid {cfg.NY}x{cfg.NX} not divisible by mesh {ny}x{nx}")


# ---------------------------------------------------------------------------
# 3-D (D3Q19) model: shard the (NY, NX) lattice dims; NZ stays local (it is
# the fused kernel's pipeline axis, and the 3-D FFT keeps one unsharded axis
# per transform stage this way).
# ---------------------------------------------------------------------------

def state_shardings3d(mesh: Mesh):
    from ..models.plasma3d import Plasma3DState

    pop = NamedSharding(mesh, P(None, None, None, AXIS_Y, AXIS_X))
    field = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))
    scalar = NamedSharding(mesh, P())
    return Plasma3DState(f=pop, g=pop, Ex=field, Ey=field, Ez=field,
                         phi=field, step=scalar)


def shard_state3d(state, mesh: Mesh):
    sh = state_shardings3d(mesh)
    return jax.tree.map(jax.device_put, state, sh)


def make_sharded_step3d(cfg: PlasmaConfig, mesh: Mesh, donate: bool = True):
    """Jitted 3-D step with (NY, NX)-sharded state (GSPMD; jnp backend —
    the fused kernel is a single-device program, its multi-chip story is
    per-shard invocation under shard_map as in fused_sharded.py)."""
    import dataclasses as _dc

    from ..models.plasma3d import make_step

    sh = state_shardings3d(mesh)
    step = make_step(_dc.replace(cfg, backend="jnp"))
    return jax.jit(step, in_shardings=(sh,), out_shardings=sh,
                   donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Cavity: the reference's OpenMP-parallel validation workload
# (old codes/LBM_classic/LBM.cpp runs every loop under omp parallel for) —
# here the same (dy, dx) lattice decomposition under GSPMD. Bounce-back
# walls + the moving lid are slice updates, which the partitioner turns
# into shard-local edits + boundary collective-permutes.
# ---------------------------------------------------------------------------

def cavity_state_shardings(mesh: Mesh):
    from ..models.cavity import CavityState

    pop = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))
    field = NamedSharding(mesh, P(AXIS_Y, AXIS_X))
    scalar = NamedSharding(mesh, P())
    return CavityState(f=pop, rho=field, ux=field, uy=field, step=scalar)


def shard_cavity_state(state, mesh: Mesh):
    """Place an existing cavity state onto the mesh."""
    return jax.tree.map(jax.device_put, state, cavity_state_shardings(mesh))


def make_sharded_cavity_step(cfg: CavityConfig, mesh: Mesh,
                             donate: bool = True):
    """Jitted cavity step with lattice-sharded inputs/outputs.

    NOTE: the grid must divide the mesh — the CANONICAL Ghia validation
    grid (the CavityConfig default, NX = NY = 129) is odd and therefore
    indivisible by any multi-device mesh; shard a 128/130-class grid, or
    run the 129^2 Ghia check single-device (it takes seconds).
    """
    from ..models.cavity import make_step as make_cavity_step

    validate_grid(cfg, mesh)   # duck-types: reads cfg.NY / cfg.NX
    # GSPMD partitions the jnp step; a pallas_call is opaque to the
    # partitioner (the fused kernel's multi-chip story is the shard_map
    # halo path, fused_sharded.make_fused_sharded_cavity_step)
    cfg = _dc.replace(cfg, backend="jnp")
    sh = cavity_state_shardings(mesh)
    return jax.jit(make_cavity_step(cfg), in_shardings=(sh,),
                   out_shardings=sh, donate_argnums=(0,) if donate else ())
