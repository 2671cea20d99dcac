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

import dataclasses as _dc

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import BC, PlasmaConfig, PoissonSolver
from ..kernels.fused_step import collide_stream_halo, collide_stream_halo2d
from ..models.plasma import PlasmaState, _solve_poisson
from .mesh import AXIS_X, AXIS_Y

AXIS_Z = "dz"


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
    if cfg.bc != BC.PERIODIC:
        # the halo protocol is periodic-only; bounce-back multi-chip runs
        # use the GSPMD path (parallel/sharding.py), which shards the
        # jnp step's edge fixups correctly
        raise ValueError("fused sharded step is periodic-BC only; use "
                         "parallel.sharding.make_sharded_step for "
                         "bounce-back")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)

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
        # GSPMD-partitionable XLA solves only (a pallas FFT or
        # VMEM-resident iterative sweep would run shard-local)
        Ex, Ey, phi = _solve_poisson(_dc.replace(cfg, fft_engine="xla", iter_engine="xla"),
                                     rho_q, state.phi,
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


def make_fused_sharded_step_2d(
    cfg: PlasmaConfig,
    mesh: Mesh,
    interpret: bool | None = None,
) -> Callable[[PlasmaState], PlasmaState]:
    """Jitted sharded step over a 2-D (dy, dx) mesh — the BASELINE config #4
    topology (e.g. 4096^2 on a v5p-8 as a 2x4 mesh, each shard 2048x1024).

    Per step: 8-row strips ppermute along dy, 8-column strips along dx, and
    the y-strips are corner-extended via a second dx-ppermute of their edge
    columns; the fused halo2d kernel consumes all of it locally (collide +
    streaming in one pass). The Poisson solve runs on the globally sharded
    rho_q under GSPMD.
    """
    for ax in (AXIS_Y, AXIS_X):
        if ax not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{ax}' axis")
    ny_dev = mesh.shape[AXIS_Y]
    nx_dev = mesh.shape[AXIS_X]
    if cfg.NY % (8 * ny_dev) or cfg.NX % (max(nx_dev, 1) * 8):
        raise ValueError("NY/NX must be divisible by 8*mesh dims")
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("sharded fused step supports FFT/NONE Poisson")
    if cfg.bc != BC.PERIODIC:
        raise ValueError("fused sharded step is periodic-BC only; use "
                         "parallel.sharding.make_sharded_step for "
                         "bounce-back")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)

    pop_spec = P(None, None, AXIS_Y, AXIS_X)
    fld_spec = P(AXIS_Y, AXIS_X)

    fwd_y = [(d, (d + 1) % ny_dev) for d in range(ny_dev)]
    bwd_y = [(d, (d - 1) % ny_dev) for d in range(ny_dev)]
    fwd_x = [(d, (d + 1) % nx_dev) for d in range(nx_dev)]
    bwd_x = [(d, (d - 1) % nx_dev) for d in range(nx_dev)]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pop_spec, pop_spec, fld_spec, fld_spec),
             out_specs=(pop_spec, pop_spec, fld_spec),
             check_vma=False)
    def local_step(f, g, Ex, Ey):
        def yext(a):
            """Corner-extended up/dn row strips for one array."""
            up = jax.lax.ppermute(a[..., -8:, :], AXIS_Y, fwd_y)
            dn = jax.lax.ppermute(a[..., :8, :], AXIS_Y, bwd_y)

            def extend(strip):
                left = jax.lax.ppermute(strip[..., -8:], AXIS_X, fwd_x)
                right = jax.lax.ppermute(strip[..., :8], AXIS_X, bwd_x)
                return jnp.concatenate((left, strip, right), axis=-1)

            return extend(up), extend(dn)

        def xstrips(a):
            lt = jax.lax.ppermute(a[..., :, -8:], AXIS_X, fwd_x)
            rt = jax.lax.ppermute(a[..., :, :8], AXIS_X, bwd_x)
            return lt, rt

        ups, dns, lts, rts = [], [], [], []
        for a in (f, g, Ex, Ey):
            up, dn = yext(a)
            lt, rt = xstrips(a)
            ups.append(up)
            dns.append(dn)
            lts.append(lt)
            rts.append(rt)
        return collide_stream_halo2d(
            f, g, Ex, Ey, *ups, *dns, *lts, *rts,
            interpret=interpret, **phys)

    def step(state: PlasmaState) -> PlasmaState:
        f, g, rho_q = local_step(state.f, state.g, state.Ex, state.Ey)
        # GSPMD-partitionable XLA solves only (a pallas FFT or
        # VMEM-resident iterative sweep would run shard-local)
        Ex, Ey, phi = _solve_poisson(_dc.replace(cfg, fft_engine="xla", iter_engine="xla"),
                                     rho_q, state.phi,
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


def make_fused_sharded_step3d(
    cfg: PlasmaConfig,
    mesh: Mesh,
    interpret: bool | None = None,
):
    """Multi-chip 3-D fused step: z-sharded shard_map + ICI slice halos.

    The (NZ, NY, NX) lattice is sharded along z over a 1-D mesh (axis
    "dz"); each step every device ppermutes its boundary z-slices of
    f, g, Ex, Ey, Ez to its neighbors (ring, periodic) and runs the
    halo-variant 3-D fused kernel on its shard. The Poisson solve runs on
    the globally z-sharded rho_q under GSPMD (per-axis FFTs -> collective
    transpose). z is also the kernel's pipeline axis, so sharding it
    costs nothing extra in VMEM.
    """
    from ..kernels.fused_step3d import collide_stream_halo3d
    from ..models.plasma3d import (Plasma3DState, _poisson_and_pack,
                                   efield_periodic3d, spectral_inv3d)

    if AXIS_Z not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Z}' axis")
    n_dev = mesh.shape[AXIS_Z]
    extra = [a for a in mesh.axis_names if a != AXIS_Z and mesh.shape[a] != 1]
    if extra:
        raise ValueError(f"3-D fused sharded step is 1-D ({AXIS_Z}) only; "
                         f"got nontrivial axes {extra}")
    if cfg.NZ % n_dev:
        raise ValueError(f"NZ={cfg.NZ} must be divisible by {n_dev}")
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("sharded fused step supports FFT/NONE Poisson")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)

    pop_spec = P(None, None, AXIS_Z, None, None)
    fld_spec = P(AXIS_Z, None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pop_spec, pop_spec, fld_spec, fld_spec, fld_spec),
             out_specs=(pop_spec, pop_spec, fld_spec),
             check_vma=False)  # pallas_call outputs carry no vma metadata
    def local_step(f, g, Ex, Ey, Ez):
        fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
        bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

        def xchg(a, sl, perm):
            return jax.lax.ppermute(a[..., sl, :, :], AXIS_Z, perm)

        up = [xchg(a, slice(-1, None), fwd) for a in (f, g, Ex, Ey, Ez)]
        dn = [xchg(a, slice(0, 1), bwd) for a in (f, g, Ex, Ey, Ez)]
        return collide_stream_halo3d(
            f, g, Ex, Ey, Ez, *up, *dn, interpret=interpret, **phys)

    def solve_fft_transposed(rho_q):
        """Distributed spectral solve: every 1-D FFT runs along a LOCAL
        axis; the lattice is resharded z->y between the (x, y) and z
        transform stages (the classic slab-decomposition FFT — XLA's
        sharded-axis FFT handler crashes/miscompiles, so the transposes
        are explicit sharding constraints and the transforms stay
        local)."""
        NZ, NY, NX = rho_q.shape
        z_sh = NamedSharding(mesh, P(AXIS_Z, None, None))
        y_sh = NamedSharding(mesh, P(None, AXIS_Z, None))
        pin = jax.lax.with_sharding_constraint
        # every transform's OUTPUT is pinned so backward sharding
        # propagation can never put a partitioned dim under an fft op
        h = pin(jnp.fft.rfft(rho_q, axis=-1), z_sh)   # x: local
        h = pin(jnp.fft.fft(h, axis=-2), z_sh)        # y: local
        h = pin(h, y_sh)                              # all-to-all z<->y
        h = pin(jnp.fft.fft(h, axis=-3), y_sh)        # z: now local
        h = h * jnp.asarray(spectral_inv3d(NZ, NY, NX), h.dtype)
        h = pin(jnp.fft.ifft(h, axis=-3), y_sh)
        h = pin(h, z_sh)                              # back to z-sharded
        h = pin(jnp.fft.ifft(h, axis=-2), z_sh)
        h = pin(jnp.fft.irfft(h, n=NX, axis=-1), z_sh)
        return h.astype(rho_q.dtype)

    def step(state):
        f, g, rho_q = local_step(state.f, state.g, state.Ex, state.Ey,
                                 state.Ez)
        if cfg.poisson == PoissonSolver.FFT:
            phi = solve_fft_transposed(rho_q)
            Ex, Ey, Ez = efield_periodic3d(phi)
            return Plasma3DState(f=f, g=g, Ex=Ex, Ey=Ey, Ez=Ez, phi=phi,
                                 step=state.step + 1)
        return _poisson_and_pack(cfg, state, f, g, rho_q)

    shardings = Plasma3DState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        Ez=NamedSharding(mesh, fld_spec), phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(step, in_shardings=(shardings,), out_shardings=shardings)


def make_fused_sharded_step3d_y(
    cfg: PlasmaConfig,
    mesh: Mesh,
    interpret: bool | None = None,
):
    """Multi-chip 3-D fused step for WIDE cross-sections: y-sharded
    shard_map + ICI row halos + the y-paneled kernel.

    z-sharding (make_fused_sharded_step3d) divides the pipeline axis, so
    every shard still holds full (NY, NX) z-slices in VMEM — a 512^2+
    cross-section VMEM-rejects the single halo kernel on every chip. Here
    the lattice is sharded along y (axis "dy"): shards ARE panels, each
    device ppermutes its single boundary PRE-collision row of
    f/g/Ex/Ey/Ez to its y-neighbors (the panel kernel's 1-row halo slab
    protocol, kernels/fused_panel3d.py), and the kernel collides the
    received rows redundantly — bitwise-identical to the neighbor's own
    result. The spectral solve is slab-decomposed with an explicit y<->z
    reshard so every 1-D FFT runs on a local axis; the transforms run in
    x, z, y order (y last, so only 2 reshards are needed — keeping the
    single-device x, y, z order would take 4 because the sharded axis
    sits in the middle), which commutes exactly but rounds differently
    in the last bit, so full-step trajectories match the single-device
    step to FFT-reordering roundoff rather than bitwise.
    """
    from ..kernels.fused_panel3d import collide_stream_panel3d, pick_panel3d
    from ..models.plasma3d import (Plasma3DState, _poisson_and_pack,
                                   efield_periodic3d, spectral_inv3d)

    if AXIS_Y not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Y}' axis")
    n_dev = mesh.shape[AXIS_Y]
    extra = [a for a in mesh.axis_names if a != AXIS_Y and mesh.shape[a] != 1]
    if extra:
        raise ValueError(f"y-sharded 3-D fused step is 1-D ({AXIS_Y}) only; "
                         f"got nontrivial axes {extra}")
    if cfg.NY % n_dev:
        raise ValueError(f"NY={cfg.NY} must be divisible by {n_dev}")
    ny_local = cfg.NY // n_dev
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
    pick_panel3d(ny_local, cfg.NX, itemsize)   # raise early if infeasible
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("sharded fused step supports FFT/NONE Poisson")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)

    pop_spec = P(None, None, None, AXIS_Y, None)
    fld_spec = P(None, AXIS_Y, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pop_spec, pop_spec, fld_spec, fld_spec, fld_spec),
             out_specs=(pop_spec, pop_spec, fld_spec),
             check_vma=False)  # pallas_call outputs carry no vma metadata
    def local_step(f, g, Ex, Ey, Ez):
        fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
        bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

        def xchg(a, row, perm):
            return jax.lax.ppermute(a[..., row, :], AXIS_Y, perm)

        arrays = (f, g, Ex, Ey, Ez)
        up = [xchg(a, -1, fwd) for a in arrays]   # prev device's last row
        dn = [xchg(a, 0, bwd) for a in arrays]    # next device's first row
        return collide_stream_panel3d(
            f, g, Ex, Ey, Ez, interpret=interpret,
            halo_rows=(*up, *dn), **phys)

    def solve_fft_transposed(rho_q):
        """Slab-decomposed spectral solve on the y-sharded lattice: x and
        z transforms are local; the lattice is resharded y->z for the y
        transform (cf. make_fused_sharded_step3d's z->y variant)."""
        NZ, NY, NX = rho_q.shape
        y_sh = NamedSharding(mesh, P(None, AXIS_Y, None))
        z_sh = NamedSharding(mesh, P(AXIS_Y, None, None))
        pin = jax.lax.with_sharding_constraint
        h = pin(jnp.fft.rfft(rho_q, axis=-1), y_sh)   # x: local
        h = pin(jnp.fft.fft(h, axis=-3), y_sh)        # z: local
        h = pin(h, z_sh)                              # all-to-all y<->z
        h = pin(jnp.fft.fft(h, axis=-2), z_sh)        # y: now local
        h = h * jnp.asarray(spectral_inv3d(NZ, NY, NX), h.dtype)
        h = pin(jnp.fft.ifft(h, axis=-2), z_sh)
        h = pin(h, y_sh)                              # back to y-sharded
        h = pin(jnp.fft.ifft(h, axis=-3), y_sh)
        h = pin(jnp.fft.irfft(h, n=NX, axis=-1), y_sh)
        return h.astype(rho_q.dtype)

    def step(state):
        f, g, rho_q = local_step(state.f, state.g, state.Ex, state.Ey,
                                 state.Ez)
        if cfg.poisson == PoissonSolver.FFT:
            phi = solve_fft_transposed(rho_q)
            Ex, Ey, Ez = efield_periodic3d(phi)
            return Plasma3DState(f=f, g=g, Ex=Ex, Ey=Ey, Ez=Ez, phi=phi,
                                 step=state.step + 1)
        return _poisson_and_pack(cfg, state, f, g, rho_q)

    shardings = Plasma3DState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        Ez=NamedSharding(mesh, fld_spec), phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(step, in_shardings=(shardings,), out_shardings=shardings)


def make_fused_sharded_step3d_yz(
    cfg: PlasmaConfig,
    mesh: Mesh,
    interpret: bool | None = None,
):
    """Multi-chip 3-D fused step over a 2-D ("dz", "dy") device mesh —
    wide AND deep columns at once (e.g. 1024^2 x 1024 over 4x4 chips).

    Composition of the two 1-D protocols: along dz every device
    ppermutes its boundary PRE-collision z-SLICES (the z-sharded path's
    slice-halo protocol, make_fused_sharded_step3d); along dy its
    boundary PRE-collision y-ROWS (the y-sharded path's 1-row slab
    protocol, make_fused_sharded_step3d_y); and the received z-halo
    slices' own edge rows take one MORE dy-hop to supply the
    (y, z)-diagonal corner rows (the classic two-hop corner exchange,
    cf. make_fused_sharded_step_2d's corner-extended strips). Each shard
    then runs the z-halo panel kernel
    (kernels/fused_panel3d.collide_stream_panel3d_zhalo), which collides
    every received row/slice redundantly — elementwise, so bitwise equal
    to the neighbor's own result.

    The spectral solve is the 2-D-sharded per-axis decomposition: x is
    local from the start; the lattice is resharded y<->x (dy axis) for
    the y transform and z<->y (dz axis) for the z transform — four
    all-to-alls per solve (two out, two back), each along a single mesh
    axis. Every 1-D FFT runs on a LOCAL axis (XLA's sharded-axis FFT
    handler is avoided entirely, same reason as the 1-D paths).

    Degenerate mesh extents compose exactly: dz=1 (or dy=1) makes the
    corresponding ppermute a self-loop, i.e. the shard's own periodic
    wrap.
    """
    from ..kernels.fused_panel3d import (collide_stream_panel3d_zhalo,
                                         pick_panel3d)
    from ..models.plasma3d import (Plasma3DState, _poisson_and_pack,
                                   efield_periodic3d, spectral_inv3d)

    for ax in (AXIS_Z, AXIS_Y):
        if ax not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{ax}' axis")
    dz = mesh.shape[AXIS_Z]
    dy = mesh.shape[AXIS_Y]
    extra = [a for a in mesh.axis_names
             if a not in (AXIS_Z, AXIS_Y) and mesh.shape[a] != 1]
    if extra:
        raise ValueError(f"(dz, dy) 3-D fused step: unexpected nontrivial "
                         f"mesh axes {extra}")
    if cfg.NZ % dz:
        raise ValueError(f"NZ={cfg.NZ} must be divisible by dz={dz}")
    if cfg.NY % dy:
        raise ValueError(f"NY={cfg.NY} must be divisible by dy={dy}")
    ny_local = cfg.NY // dy
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
    pick_panel3d(ny_local, cfg.NX, itemsize, zhalo=True)  # raise early
    if cfg.poisson not in (PoissonSolver.FFT, PoissonSolver.NONE):
        raise ValueError("sharded fused step supports FFT/NONE Poisson")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)

    pop_spec = P(None, None, AXIS_Z, AXIS_Y, None)
    fld_spec = P(AXIS_Z, AXIS_Y, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pop_spec, pop_spec, fld_spec, fld_spec, fld_spec),
             out_specs=(pop_spec, pop_spec, fld_spec),
             check_vma=False)  # pallas_call outputs carry no vma metadata
    def local_step(f, g, Ex, Ey, Ez):
        fwd_z = [(d, (d + 1) % dz) for d in range(dz)]  # recv from z-1
        bwd_z = [(d, (d - 1) % dz) for d in range(dz)]  # recv from z+1
        fwd_y = [(d, (d + 1) % dy) for d in range(dy)]
        bwd_y = [(d, (d - 1) % dy) for d in range(dy)]

        arrays = (f, g, Ex, Ey, Ez)
        # z-halo slices: the slice just above (previous z-shard's last) /
        # below this shard; a[..., -1, :, :] indexes the z axis
        up_sl = [jax.lax.ppermute(a[..., -1, :, :], AXIS_Z, fwd_z)
                 for a in arrays]
        dn_sl = [jax.lax.ppermute(a[..., 0, :, :], AXIS_Z, bwd_z)
                 for a in arrays]
        # y-halo rows (full local z depth)
        up_row = [jax.lax.ppermute(a[..., -1, :], AXIS_Y, fwd_y)
                  for a in arrays]
        dn_row = [jax.lax.ppermute(a[..., 0, :], AXIS_Y, bwd_y)
                  for a in arrays]
        # corners: the y-neighbor rows WITHIN the z-halo slices (every
        # shard already holds its z-halos, so one dy-hop of their edge
        # rows is exactly the diagonal neighbor's corner row)
        up_above = [jax.lax.ppermute(s[..., -1, :], AXIS_Y, fwd_y)
                    for s in up_sl]
        up_below = [jax.lax.ppermute(s[..., 0, :], AXIS_Y, bwd_y)
                    for s in up_sl]
        dn_above = [jax.lax.ppermute(s[..., -1, :], AXIS_Y, fwd_y)
                    for s in dn_sl]
        dn_below = [jax.lax.ppermute(s[..., 0, :], AXIS_Y, bwd_y)
                    for s in dn_sl]
        return collide_stream_panel3d_zhalo(
            f, g, Ex, Ey, Ez,
            (*up_sl, *dn_sl), (*up_row, *dn_row),
            (*up_above, *up_below), (*dn_above, *dn_below),
            interpret=interpret, **phys)

    def solve_fft_2dsharded(rho_q):
        """2-D-sharded per-axis spectral solve: x local, then reshard
        y<->x (dy) for the y transform and z<->y (dz) for the z
        transform; inverse retraces the reshards."""
        NZ, NY, NX = rho_q.shape
        zy = NamedSharding(mesh, P(AXIS_Z, AXIS_Y, None))
        zx = NamedSharding(mesh, P(AXIS_Z, None, AXIS_Y))   # x over dy
        yx = NamedSharding(mesh, P(None, AXIS_Z, AXIS_Y))   # y over dz
        pin = jax.lax.with_sharding_constraint
        h = pin(jnp.fft.rfft(rho_q, axis=-1), zy)   # x: local
        h = pin(h, zx)                              # all-to-all y<->x (dy)
        h = pin(jnp.fft.fft(h, axis=-2), zx)        # y: now local
        h = pin(h, yx)                              # all-to-all z<->y (dz)
        h = pin(jnp.fft.fft(h, axis=-3), yx)        # z: now local
        h = h * jnp.asarray(spectral_inv3d(NZ, NY, NX), h.dtype)
        h = pin(jnp.fft.ifft(h, axis=-3), yx)
        h = pin(h, zx)
        h = pin(jnp.fft.ifft(h, axis=-2), zx)
        h = pin(h, zy)
        h = pin(jnp.fft.irfft(h, n=NX, axis=-1), zy)
        return h.astype(rho_q.dtype)

    def step(state):
        f, g, rho_q = local_step(state.f, state.g, state.Ex, state.Ey,
                                 state.Ez)
        if cfg.poisson == PoissonSolver.FFT:
            phi = solve_fft_2dsharded(rho_q)
            Ex, Ey, Ez = efield_periodic3d(phi)
            return Plasma3DState(f=f, g=g, Ex=Ex, Ey=Ey, Ez=Ez, phi=phi,
                                 step=state.step + 1)
        return _poisson_and_pack(cfg, state, f, g, rho_q)

    shardings = Plasma3DState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        Ez=NamedSharding(mesh, fld_spec), phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(step, in_shardings=(shardings,), out_shardings=shardings)


def make_fused_sharded_step3d_auto(
    cfg: PlasmaConfig,
    devices,
    interpret: bool | None = None,
):
    """Pick the 3-D lattice decomposition for a flat device list.

    Encodes the mesh-selection table (docs/MIGRATION.md section 6) as
    code, in preference order:

      1. z-sharded slice halos (make_fused_sharded_step3d) when one
         chip's slice kernels admit the FULL (NY, NX) cross-section
         (kernels/fused_step3d.check_vmem3d) and NZ divides with >= 2
         slices per shard — the cheapest halo protocol and the fastest
         kernel;
      2. y-sharded panels (make_fused_sharded_step3d_y) when the
         cross-section is too wide for (1) but the per-shard
         (NY/n, NX) panel is feasible (kernels/fused_panel3d
         .pick_panel3d) — wide cross-sections;
      3. a (dz, dy) 2-D mesh (make_fused_sharded_step3d_yz), trying dy
         ascending from 1 (dy=1 = z-sharding with the wide-capable
         z-halo panel kernel; larger dy = narrower panels) and taking
         the first factorization whose per-shard panel is feasible —
         grids that are wide AND deep.

    Returns ``(step, mesh, shardings)``: the jitted step, the
    constructed jax.sharding.Mesh, and a Plasma3DState of NamedShardings
    for placing a host/single-device state onto the mesh
    (``jax.tree.map(jax.device_put, state, shardings)``).

    Raises ValueError when no decomposition fits (indivisible grid axes
    or a cross-section past every kernel's VMEM budget).
    """
    import numpy as np

    from ..kernels.fused_panel3d import pick_panel3d
    from ..kernels.fused_step3d import check_vmem3d
    from ..models.plasma3d import Plasma3DState

    devs = list(devices)
    n = len(devs)
    if n < 2:
        raise ValueError("auto 3-D sharding needs >= 2 devices")
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize

    def feasible(fn, *a, **k):
        try:
            fn(*a, **k)
            return True
        except ValueError:
            return False

    def result(make, mesh, pop_spec, fld_spec):
        step = make(cfg, mesh, interpret=interpret)
        sh_pop = NamedSharding(mesh, pop_spec)
        sh_fld = NamedSharding(mesh, fld_spec)
        shardings = Plasma3DState(
            f=sh_pop, g=sh_pop, Ex=sh_fld, Ey=sh_fld, Ez=sh_fld,
            phi=sh_fld, step=NamedSharding(mesh, P()))
        return step, mesh, shardings

    if (cfg.NZ % n == 0 and cfg.NZ // n >= 2
            and feasible(check_vmem3d, cfg.NY, cfg.NX, itemsize)):
        mesh = Mesh(np.asarray(devs).reshape(n), (AXIS_Z,))
        return result(make_fused_sharded_step3d, mesh,
                      P(None, None, AXIS_Z, None, None),
                      P(AXIS_Z, None, None))

    if (cfg.NY % n == 0
            and feasible(pick_panel3d, cfg.NY // n, cfg.NX, itemsize)):
        mesh = Mesh(np.asarray(devs).reshape(n), (AXIS_Y,))
        return result(make_fused_sharded_step3d_y, mesh,
                      P(None, None, None, AXIS_Y, None),
                      P(None, AXIS_Y, None))

    for dy in (d for d in range(1, n) if n % d == 0):
        dz = n // dy
        if cfg.NY % dy or cfg.NZ % dz or cfg.NZ // dz < 2:
            continue
        if feasible(pick_panel3d, cfg.NY // dy, cfg.NX, itemsize,
                    zhalo=True):
            mesh = Mesh(np.asarray(devs).reshape(dz, dy),
                        (AXIS_Z, AXIS_Y))
            return result(make_fused_sharded_step3d_yz, mesh,
                          P(None, None, AXIS_Z, AXIS_Y, None),
                          P(AXIS_Z, AXIS_Y, None))

    raise ValueError(
        f"no feasible 3-D decomposition of NZxNYxNX = "
        f"{cfg.NZ}x{cfg.NY}x{cfg.NX} over {n} devices: either an axis is "
        f"indivisible or the per-shard cross-section exceeds every "
        f"kernel's VMEM budget (docs/MIGRATION.md section 6)")


def make_fused_sharded_cavity_step(
    cfg,
    mesh: Mesh,
    interpret: bool | None = None,
):
    """Jitted multi-chip cavity step: fused halo kernel over a 1-D (dy)
    row-sharded mesh.

    The TPU-native replacement for the reference cavity's OpenMP loops
    (old codes/LBM_classic/LBM.cpp `#pragma omp parallel for`; its strong
    scaling flat-lined at ~2x on 4 cores, BASELINE.md). Each step every
    device ppermutes its edge 8-row strips of f AND the stored macros to
    its y-neighbors (the halo collide needs both), then runs the fused
    collide+stream+BC+macros kernel on its shard; the bottom-wall / lid
    fixups are gated to the shards holding the global walls. No global
    stage exists (the cavity has no Poisson solve), so the step is pure
    neighbor traffic: O(NX) bytes per device per step over ICI.

    Requires NY divisible by 8 * n_devices. Returns a jitted step with
    in/out shardings set (jit re-places any input state).

    cfg.lean_macros runs the populations-only protocol (9-plane ICI strips
    instead of 12, 18-plane HBM traffic instead of 24 — the sharded analog
    of the single-device lean kernel); the returned step still materializes
    macros for the full CavityState, so long marches should prefer
    make_fused_sharded_cavity_rollout, which carries (f, step) only.
    """
    from ..kernels.fused_cavity import (collide_stream_cavity_halo,
                                        collide_stream_cavity_halo_lean)
    from ..models.cavity import CavityState, _lid_speed, macros_of

    if AXIS_Y not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Y}' axis")
    n_dev = mesh.shape[AXIS_Y]
    extra = [a for a in mesh.axis_names if a != AXIS_Y and mesh.shape[a] != 1]
    if extra:
        raise ValueError("fused sharded cavity step is 1-D (dy) only; got "
                         f"nontrivial axes {extra}")
    if cfg.NY % (8 * n_dev):
        raise ValueError(f"NY={cfg.NY} must be divisible by 8*{n_dev} "
                         "(the Ghia 129^2 default is indivisible — use the "
                         "GSPMD path or a multiple-of-8 grid)")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"
    tau = cfg.tau

    pop_spec = P(None, AXIS_Y, None)
    fld_spec = P(AXIS_Y, None)

    fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
    bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

    def xchg(a, rows, perm):
        return jax.lax.ppermute(a[..., rows, :], AXIS_Y, perm)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(pop_spec, fld_spec, fld_spec, fld_spec, P()),
             out_specs=(pop_spec, fld_spec, fld_spec, fld_spec),
             check_vma=False)  # pallas_call outputs carry no vma metadata
    def local_step(f, rho, ux, uy, u_lid_dyn):
        idx = jax.lax.axis_index(AXIS_Y)
        mac = jnp.stack([rho, ux, uy])
        f_up = xchg(f, slice(-8, None), fwd)
        m_up = xchg(mac, slice(-8, None), fwd)
        f_dn = xchg(f, slice(0, 8), bwd)
        m_dn = xchg(mac, slice(0, 8), bwd)
        return collide_stream_cavity_halo(
            f, rho, ux, uy, f_up, m_up, f_dn, m_dn,
            u_lid_dyn, (idx == 0), (idx == n_dev - 1),
            tau=tau, interpret=interpret)

    @partial(jax.shard_map, mesh=mesh, in_specs=(pop_spec, P()),
             out_specs=pop_spec, check_vma=False)
    def local_step_lean(f, u_lid_dyn):
        idx = jax.lax.axis_index(AXIS_Y)
        f_up = xchg(f, slice(-8, None), fwd)
        f_dn = xchg(f, slice(0, 8), bwd)
        return collide_stream_cavity_halo_lean(
            f, f_up, f_dn, u_lid_dyn, (idx == 0), (idx == n_dev - 1),
            tau=tau, interpret=interpret)

    lean = bool(getattr(cfg, "lean_macros", False))

    def step(state):
        u = _lid_speed(cfg, state.step)
        if lean:
            f = local_step_lean(state.f, u)
            rho, ux, uy = macros_of(cfg, f)  # elementwise: stays sharded
        else:
            f, rho, ux, uy = local_step(state.f, state.rho, state.ux,
                                        state.uy, u)
        return CavityState(f=f, rho=rho, ux=ux, uy=uy,
                           step=state.step + 1)

    shardings = CavityState(
        f=NamedSharding(mesh, pop_spec),
        rho=NamedSharding(mesh, fld_spec),
        ux=NamedSharding(mesh, fld_spec),
        uy=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    step_fn = jax.jit(step, in_shardings=(shardings,),
                      out_shardings=shardings)
    step_fn._cavity_parts = (local_step_lean if lean else local_step,
                             shardings)  # reused by the rollout constructor
    return step_fn


def make_fused_sharded_cavity_rollout(
    cfg,
    mesh: Mesh,
    n: int,
    interpret: bool | None = None,
):
    """n-step scanned multi-chip cavity rollout.

    In lean mode the scan carries (f, step) ONLY — a full-state carry
    would materialize the redundant macros every iteration, paying the
    bytes the mode exists to avoid (the same design as the single-device
    models/cavity.make_rollout) — and the macros are reconstructed once at
    the end, shard-locally. Stored-macro mode scans the full state."""
    from ..models.cavity import CavityState, _lid_speed, macros_of

    step = make_fused_sharded_cavity_step(cfg, mesh, interpret)
    local, shardings = step._cavity_parts

    if getattr(cfg, "lean_macros", False):
        def rollout(state):
            def body(c, _):
                f, t = c
                f = local(f, _lid_speed(cfg, t))
                return (f, t + 1), None
            (f, t), _ = jax.lax.scan(body, (state.f, state.step), None,
                                     length=n)
            rho, ux, uy = macros_of(cfg, f)
            return CavityState(f=f, rho=rho, ux=ux, uy=uy, step=t)
    else:
        def rollout(state):
            def body(s, _):
                u = _lid_speed(cfg, s.step)
                f, rho, ux, uy = local(s.f, s.rho, s.ux, s.uy, u)
                return CavityState(f=f, rho=rho, ux=ux, uy=uy,
                                   step=s.step + 1), None
            out, _ = jax.lax.scan(body, state, None, length=n)
            return out

    return jax.jit(rollout, in_shardings=(shardings,),
                   out_shardings=shardings)


def make_fused_sharded_multistep_rollout(
    cfg: PlasmaConfig,
    mesh: Mesh,
    n: int,
    interpret: bool | None = None,
):
    """n-step multi-chip TEMPORALLY-BLOCKED plasma rollout: K-deep ghost
    rows exchanged once per window instead of 1-row halos every step.

    Composition of the two protocols this module and
    kernels/fused_multistep.py already own: the lattice is row-sharded
    over a 1-D (dy) mesh; each K-step window every device ppermutes its
    edge K-row slabs of f, g (and E — step 1 collides with the state's
    field) to its y-neighbors, concatenates them around its shard, and
    runs the UNCHANGED single-device multistep kernel on the extended
    (rows + 2K, NX) grid. The kernel's periodic y-wrap is wrong on the
    extended grid, but the corruption it injects at the two extreme rows
    propagates inward exactly one row per step (the stencil is 1-deep),
    so after K steps it has reached ghost depth K-1 and the interior
    slice [K:-K] — the shard — is EXACT: every shard cell's K-step
    dependency cone (K rows each side) lies inside the true-valued
    extension. One kernel launch and one neighbor exchange per K steps —
    the launch/latency-bound small-grid regime that motivated temporal
    blocking is precisely where per-step ICI halos hurt most.

    Cost: the ghost rows are collided redundantly (2K/rows_per_shard
    extra work per device) and the exchange ships K rows instead of 1 —
    the window amortizes K latencies into one.

    Bounce-back configs (NONE + BB, FFT + BB — the reference's no-op
    solve, E constant) run the GATED kernel
    (kernels/fused_multistep.collide_stream_multistep_gated): the traced
    bottom/top wall rows land only on the first/last shard's extended
    grid, and — the wall overwrite consuming same-row data only — they
    BLOCK the ring ppermute's garbage wrap-ghosts from streaming inward,
    exactly the cavity analog below.

    Requires: a window-constant E — NONE + periodic (no global stage, no
    wall fixups), NONE + bounce-back, or FFT + bounce-back;
    cfg.multistep = K with K % 8 == 0
    (the extended grid must keep 8-row alignment), NY % (8 * n_dev) == 0,
    and the extended (rows + 2K, NX) state within the multistep kernel's
    VMEM budget. Windows follow models/plasma.make_rollout's dispatch:
    under the compat quirk the kernel collides step 1 with the state's E
    and later steps with 0, and the caller zeroes E after every window.
    Remainder windows (n % K) run k < K steps on the same K-deep halos
    (deeper than needed — still exact).
    """
    from ..kernels.fused_multistep import (check_vmem_multistep_plasma,
                                           collide_stream_multistep,
                                           collide_stream_multistep_gated)

    if AXIS_Y not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Y}' axis")
    n_dev = mesh.shape[AXIS_Y]
    extra = [a for a in mesh.axis_names if a != AXIS_Y and mesh.shape[a] != 1]
    if extra:
        raise ValueError("sharded multistep is 1-D (dy) only; got "
                         f"nontrivial axes {extra}")
    K = int(getattr(cfg, "multistep", 0))
    if K <= 0 or K % 8:
        raise ValueError("sharded multistep needs cfg.multistep = K with "
                         f"K % 8 == 0 (8-row alignment), got {K}")
    bounce = cfg.bc == BC.BOUNCE_BACK
    blockable = (cfg.poisson == PoissonSolver.NONE
                 or (bounce and cfg.poisson == PoissonSolver.FFT))
    if not blockable:
        raise ValueError("sharded multistep needs a window-constant E: "
                         "NONE under either BC, or FFT + bounce-back (the "
                         "no-op solve); other solvers run per-step on the "
                         "sharded paths)")
    if cfg.NY % (8 * n_dev):
        raise ValueError(f"NY={cfg.NY} must be divisible by 8*{n_dev}")
    rows = cfg.NY // n_dev
    if K > rows:
        # the one-hop ppermute can only ship rows the neighbor OWNS; a
        # K-deep ghost needs K <= rows (deeper windows would need
        # multi-hop slabs)
        raise ValueError(f"multistep K={K} exceeds rows/shard={rows}; "
                         f"the one-hop ghost exchange needs K <= rows "
                         f"(smaller K or fewer devices)")
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
    if not check_vmem_multistep_plasma(rows + 2 * K, cfg.NX, itemsize):
        raise ValueError(
            f"extended shard ({rows}+2*{K}) x {cfg.NX} exceeds the "
            f"multistep kernel's VMEM budget (smaller K or more devices)")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    kill = (cfg.poisson == PoissonSolver.NONE
            and cfg.compat.none_solver_kills_external_field)
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0,
                kill_field=kill, interpret=interpret)

    pop_spec = P(None, None, AXIS_Y, None)
    fld_spec = P(AXIS_Y, None)
    fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
    bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

    def make_window(k):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pop_spec, pop_spec, fld_spec, fld_spec),
                 out_specs=(pop_spec, pop_spec),
                 check_vma=False)
        def local_window(f, g, Ex, Ey):
            def xchg(a, rws, perm):
                return jax.lax.ppermute(a[..., rws, :], AXIS_Y, perm)

            def ext(a):
                up = xchg(a, slice(-K, None), fwd)   # rows above my first
                dn = xchg(a, slice(0, K), bwd)       # rows below my last
                return jnp.concatenate([up, a, dn], axis=-2)

            if bounce:
                # gated walls: the bottom wall sits at extended row K on
                # shard 0, the top at K + rows - 1 on the last shard; the
                # ring ppermute's wrap slabs are garbage there and the
                # gated wall blocks them (see the gated kernel docstring)
                idx = jax.lax.axis_index(AXIS_Y)
                wall = jnp.stack([
                    jnp.where(idx == 0, jnp.float32(K), jnp.float32(-1.0)),
                    jnp.where(idx == n_dev - 1, jnp.float32(K + rows - 1),
                              jnp.float32(-1.0))])
                fe, ge = collide_stream_multistep_gated(
                    ext(f), ext(g), ext(Ex), ext(Ey), wall, k_steps=k,
                    **phys)
            else:
                fe, ge = collide_stream_multistep(
                    ext(f), ext(g), ext(Ex), ext(Ey), k_steps=k, **phys)
            return fe[..., K:-K, :], ge[..., K:-K, :]

        return local_window

    win_full = make_window(K)
    rem = n % K if n > 0 else 0
    win_rem = make_window(rem) if rem else None
    full = n // K

    def window(state: PlasmaState, local, k):
        f, g = local(state.f, state.g, state.Ex, state.Ey)
        Ex, Ey = ((jnp.zeros_like(state.Ex), jnp.zeros_like(state.Ey))
                  if kill else (state.Ex, state.Ey))
        return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=state.phi,
                           step=state.step + k)

    def rollout(state: PlasmaState) -> PlasmaState:
        if full:
            def body(s, _):
                return window(s, win_full, K), None
            state, _ = jax.lax.scan(body, state, None, length=full)
        if rem:
            state = window(state, win_rem, rem)
        return state

    shardings = PlasmaState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(rollout, in_shardings=(shardings,),
                   out_shardings=shardings)


def make_fused_sharded_multistep_rollout_2d(
    cfg: PlasmaConfig,
    mesh: Mesh,
    n: int,
    interpret: bool | None = None,
):
    """n-step multi-chip temporally-blocked rollout over a 2-D (dy, dx)
    mesh — the 2-D extension of make_fused_sharded_multistep_rollout
    (SURVEY section 2.3: 2-D domain decomposition is the TPU-native
    equivalent of the reference's collapse(2) OpenMP loops,
    src/plasma.cpp:333).

    Ghost protocol: each K-step window does a TWO-PHASE slab exchange —
    first K-deep row slabs along dy (extending every shard to
    (rows + 2K, cols)), then K-deep COLUMN slabs of the ALREADY-EXTENDED
    arrays along dx. The x-slabs of an extended array contain the
    y-ghosts it just received, which are exactly the K x K corner blocks
    the diagonal (two-hop) neighbors own — the same corner trick as the
    3-D (dz, dy) per-step protocol (make_fused_sharded_step3d_yz), with
    K-deep slabs instead of single rows. The unchanged multistep kernel
    runs on the (rows + 2K, cols + 2K) extension; both of its periodic
    wraps are wrong there, but wrap corruption travels one cell per step
    in each axis, so after K steps it fills the l-inf-radius-(K-1) shell
    and the [K:-K, K:-K] interior is exact (the 2-D trapezoid — a
    pyramid — argument: every interior cell's K-step dependency cone is
    an l-inf ball of radius K inside the true-valued extension).

    NONE + PERIODIC only: the gated bounce-back kernel gates y-wall rows
    but applies x-wall columns unconditionally, which is wrong on
    x-interior shards — bounce-back 2-D meshes use the per-step paths.
    Requires K % 8 == 0, NY % (8 * ndy) == 0, NX % ndx == 0, and the
    extended shard within the kernel's VMEM budget."""
    from ..kernels.fused_multistep import (check_vmem_multistep_plasma,
                                           collide_stream_multistep)

    for ax in (AXIS_Y, AXIS_X):
        if ax not in mesh.axis_names:
            raise ValueError(f"mesh must have a '{ax}' axis")
    ndy = mesh.shape[AXIS_Y]
    ndx = mesh.shape[AXIS_X]
    K = int(getattr(cfg, "multistep", 0))
    if K <= 0 or K % 8:
        raise ValueError("2-D sharded multistep needs cfg.multistep = K "
                         f"with K % 8 == 0, got {K}")
    if cfg.poisson != PoissonSolver.NONE or cfg.bc != BC.PERIODIC:
        raise ValueError("2-D sharded multistep is NONE + periodic only "
                         "(the gated kernel's x-wall fixups are "
                         "unconditional; bounce-back 2-D meshes run the "
                         "per-step paths)")
    if cfg.NY % (8 * ndy):
        raise ValueError(f"NY={cfg.NY} must be divisible by 8*{ndy}")
    if cfg.NX % ndx:
        raise ValueError(f"NX={cfg.NX} must be divisible by {ndx}")
    rows = cfg.NY // ndy
    cols = cfg.NX // ndx
    if K > rows or (ndx > 1 and K > cols):
        raise ValueError(f"multistep K={K} exceeds rows/shard={rows} or "
                         f"cols/shard={cols}; the one-hop ghost exchange "
                         f"needs K <= both (smaller K or fewer devices)")
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
    ext_cols = cols + (2 * K if ndx > 1 else 0)
    if not check_vmem_multistep_plasma(rows + 2 * K, ext_cols, itemsize):
        raise ValueError(
            f"extended shard ({rows}+2*{K}) x {ext_cols} exceeds the "
            f"multistep kernel's VMEM budget (smaller K or more devices)")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    kill = cfg.compat.none_solver_kills_external_field
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0,
                kill_field=kill, interpret=interpret)

    pop_spec = P(None, None, AXIS_Y, AXIS_X)
    fld_spec = P(AXIS_Y, AXIS_X)
    fwd_y = [(d, (d + 1) % ndy) for d in range(ndy)]  # recv from d-1
    bwd_y = [(d, (d - 1) % ndy) for d in range(ndy)]  # recv from d+1
    fwd_x = [(d, (d + 1) % ndx) for d in range(ndx)]
    bwd_x = [(d, (d - 1) % ndx) for d in range(ndx)]

    def make_window(k):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pop_spec, pop_spec, fld_spec, fld_spec),
                 out_specs=(pop_spec, pop_spec),
                 check_vma=False)
        def local_window(f, g, Ex, Ey):
            def ext(a):
                # phase 1: row slabs along dy
                up = jax.lax.ppermute(a[..., -K:, :], AXIS_Y, fwd_y)
                dn = jax.lax.ppermute(a[..., :K, :], AXIS_Y, bwd_y)
                a = jnp.concatenate([up, a, dn], axis=-2)
                if ndx > 1:
                    # phase 2: column slabs of the EXTENDED array along
                    # dx — these carry the just-received y-ghost rows,
                    # i.e. the diagonal neighbors' K x K corner blocks
                    lf = jax.lax.ppermute(a[..., :, -K:], AXIS_X, fwd_x)
                    rt = jax.lax.ppermute(a[..., :, :K], AXIS_X, bwd_x)
                    a = jnp.concatenate([lf, a, rt], axis=-1)
                return a

            fe, ge = collide_stream_multistep(
                ext(f), ext(g), ext(Ex), ext(Ey), k_steps=k, **phys)
            if ndx > 1:
                fe, ge = fe[..., :, K:-K], ge[..., :, K:-K]
            return fe[..., K:-K, :], ge[..., K:-K, :]

        return local_window

    win_full = make_window(K)
    rem = n % K if n > 0 else 0
    win_rem = make_window(rem) if rem else None
    full = n // K

    def window(state: PlasmaState, local, k):
        f, g = local(state.f, state.g, state.Ex, state.Ey)
        Ex, Ey = ((jnp.zeros_like(state.Ex), jnp.zeros_like(state.Ey))
                  if kill else (state.Ex, state.Ey))
        return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=state.phi,
                           step=state.step + k)

    def rollout(state: PlasmaState) -> PlasmaState:
        if full:
            def body(s, _):
                return window(s, win_full, K), None
            state, _ = jax.lax.scan(body, state, None, length=full)
        if rem:
            state = window(state, win_rem, rem)
        return state

    shardings = PlasmaState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(rollout, in_shardings=(shardings,),
                   out_shardings=shardings)


def make_fused_sharded_multistep_rollout_3d(
    cfg: PlasmaConfig,
    mesh: Mesh,
    n: int,
    interpret: bool | None = None,
):
    """n-step multi-chip temporally-blocked 3-D (D3Q19) plasma rollout:
    K-deep ghost z-SLABS exchanged once per window instead of 1-slice
    halos every step — the 3-D member of the multistep matrix (the 2-D
    analogs above; SURVEY.md section 7.2 phase 8 completeness).

    The (3, 19, NZ, NY, NX) lattice is z-sharded over a 1-D ("dz") mesh.
    Each k-step window every device ppermutes its edge K z-slabs of f, g
    (and the E components — step 1 collides with the state's field) to
    its z-neighbors, concatenates them around its shard, and runs the
    per-step fused 3-D kernel (kernels/fused_step3d.collide_stream3d) k
    times locally on the extended (slices + 2K) volume. The kernel's
    periodic z-wrap is wrong on the extended volume, but the corruption
    it injects at the two extreme slices travels inward exactly one
    slice per step (the D3Q19 stencil is 1-deep in z), so after k <= K
    steps the interior slice [K:-K] — the shard — is EXACT. One ghost
    exchange per K steps; z is the kernel's pipeline axis, so the 2K
    extra slices cost no VMEM (check_vmem3d gates cross-section only).

    Unlike the 2-D row protocol there is NO K % 8 constraint: z-slabs
    slice the third-minor axis (sublane alignment lives in (NY, NX)),
    so any K >= 1 with K <= slices-per-shard works.

    Requires a window-constant E: the NONE solver (either compat — under
    the reference quirk, src/poisson.cpp:34-43, step 1 collides with the
    state's E and later steps with 0, and the rollout zeroes E after
    every window). FFT is a global solve and runs per-step
    (make_fused_sharded_step3d); see docs/STATUS.md for why blocked
    global solves cannot shard.
    """
    from ..kernels.fused_step3d import check_vmem3d, collide_stream3d
    from ..models.plasma3d import Plasma3DState

    if AXIS_Z not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Z}' axis")
    n_dev = mesh.shape[AXIS_Z]
    extra = [a for a in mesh.axis_names if a != AXIS_Z and mesh.shape[a] != 1]
    if extra:
        raise ValueError("3-D sharded multistep is 1-D (dz) only; got "
                         f"nontrivial axes {extra}")
    K = int(getattr(cfg, "multistep", 0))
    if K <= 0:
        raise ValueError(f"cfg.multistep must be >= 1, got {K}")
    if cfg.poisson != PoissonSolver.NONE:
        raise ValueError("3-D sharded multistep needs a window-constant E: "
                         "the NONE solver only (FFT is a global per-step "
                         "solve — use make_fused_sharded_step3d)")
    if cfg.NZ % n_dev:
        raise ValueError(f"NZ={cfg.NZ} must be divisible by {n_dev}")
    slices = cfg.NZ // n_dev
    if K > slices:
        raise ValueError(f"multistep K={K} exceeds z-slices/shard={slices}; "
                         f"the one-hop ghost exchange needs K <= slices")
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
    check_vmem3d(cfg.NY, cfg.NX, itemsize)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    u = cfg.units()
    kill = cfg.compat.none_solver_kills_external_field
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0,
                interpret=interpret)

    pop_spec = P(None, None, AXIS_Z, None, None)
    fld_spec = P(AXIS_Z, None, None)
    fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
    bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

    def make_window(k):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pop_spec, pop_spec, fld_spec, fld_spec, fld_spec),
                 out_specs=(pop_spec, pop_spec),
                 check_vma=False)
        def local_window(f, g, Ex, Ey, Ez):
            def ext(a):
                up = jax.lax.ppermute(a[..., -K:, :, :], AXIS_Z, fwd)
                dn = jax.lax.ppermute(a[..., :K, :, :], AXIS_Z, bwd)
                return jnp.concatenate([up, a, dn], axis=-3)

            fe, ge = ext(f), ext(g)
            Exe, Eye, Eze = ext(Ex), ext(Ey), ext(Ez)
            # step 1 collides with the state's E; steps 2..k with 0 under
            # the kill quirk (E constant over the window either way)
            fe, ge, _ = collide_stream3d(fe, ge, Exe, Eye, Eze, **phys)
            if k > 1:
                if kill:
                    Exe = jnp.zeros_like(Exe)
                    Eye = jnp.zeros_like(Eye)
                    Eze = jnp.zeros_like(Eze)

                def body(carry, _):
                    fc, gc = carry
                    fc, gc, _ = collide_stream3d(fc, gc, Exe, Eye, Eze,
                                                 **phys)
                    return (fc, gc), None
                (fe, ge), _ = jax.lax.scan(body, (fe, ge), None,
                                           length=k - 1)
            return fe[..., K:-K, :, :], ge[..., K:-K, :, :]

        return local_window

    win_full = make_window(K)
    rem = n % K if n > 0 else 0
    win_rem = make_window(rem) if rem else None
    full = n // K

    def window(state, local, k):
        f, g = local(state.f, state.g, state.Ex, state.Ey, state.Ez)
        z = jnp.zeros_like(state.Ex)
        Ex, Ey, Ez = ((z, z, z) if kill
                      else (state.Ex, state.Ey, state.Ez))
        return Plasma3DState(f=f, g=g, Ex=Ex, Ey=Ey, Ez=Ez, phi=state.phi,
                             step=state.step + k)

    def rollout(state):
        if full:
            def body(s, _):
                return window(s, win_full, K), None
            state, _ = jax.lax.scan(body, state, None, length=full)
        if rem:
            state = window(state, win_rem, rem)
        return state

    shardings = Plasma3DState(
        f=NamedSharding(mesh, pop_spec), g=NamedSharding(mesh, pop_spec),
        Ex=NamedSharding(mesh, fld_spec), Ey=NamedSharding(mesh, fld_spec),
        Ez=NamedSharding(mesh, fld_spec), phi=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(rollout, in_shardings=(shardings,),
                   out_shardings=shardings)


def make_fused_sharded_cavity_multistep_rollout(
    cfg,
    mesh: Mesh,
    n: int,
    interpret: bool | None = None,
):
    """n-step multi-chip TEMPORALLY-BLOCKED cavity rollout: the cavity
    analog of make_fused_sharded_multistep_rollout.

    Each K-step window every device ppermutes K-deep ghost-row slabs of
    f to its y-neighbors and runs the GATED multistep kernel
    (kernels/fused_cavity.collide_stream_cavity_multistep_gated) on the
    extended (rows + 2K) shard: the bottom-wall / lid fixups are traced
    row indices — extended row K on shard 0, K + rows - 1 on the last
    shard, -1 (never) elsewhere. The wall overwrite consumes same-row
    data only, so on the boundary shards it BLOCKS the garbage ghost
    rows (the ring exchange wraps) from streaming into the shard; on
    interior shards the ghosts hold true neighbor rows and the plasma
    rollout's trapezoid argument applies unchanged (wrap corruption
    travels 1 row/step < K). Lean semantics: the scan carries (f, step)
    only and macros are materialized shard-locally at the end.

    Requires NY % n_dev == 0 and the extended shard within the multistep
    kernel's VMEM budget (any alignment — the kernel is whole-plane
    value ops)."""
    from ..kernels.fused_cavity import (
        check_vmem_multistep, collide_stream_cavity_multistep_gated)
    from ..models.cavity import CavityState, macros_of

    if AXIS_Y not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{AXIS_Y}' axis")
    n_dev = mesh.shape[AXIS_Y]
    extra = [a for a in mesh.axis_names if a != AXIS_Y and mesh.shape[a] != 1]
    if extra:
        raise ValueError("sharded cavity multistep is 1-D (dy) only; got "
                         f"nontrivial axes {extra}")
    K = int(getattr(cfg, "multistep", 0))
    if K <= 0:
        raise ValueError("sharded cavity multistep needs cfg.multistep > 0")
    if cfg.NY % n_dev:
        raise ValueError(f"NY={cfg.NY} must be divisible by {n_dev}")
    rows = cfg.NY // n_dev
    if K > rows:
        # same one-hop constraint as the plasma rollout: a ghost deeper
        # than the neighbor's shard cannot come from one ppermute
        raise ValueError(f"multistep K={K} exceeds rows/shard={rows}; "
                         f"the one-hop ghost exchange needs K <= rows "
                         f"(smaller K or fewer devices)")
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
    if not check_vmem_multistep(rows + 2 * K, cfg.NX, itemsize):
        raise ValueError(
            f"extended shard ({rows}+2*{K}) x {cfg.NX} exceeds the cavity "
            f"multistep kernel's VMEM budget (smaller K or more devices)")
    if interpret is None:
        interpret = mesh.devices.flat[0].platform == "cpu"

    tau = cfg.tau
    phys = dict(tau=tau, u_lid=cfg.u_lid, sigma=cfg.sigma,
                interpret=interpret)
    pop_spec = P(None, AXIS_Y, None)
    fld_spec = P(AXIS_Y, None)
    fwd = [(d, (d + 1) % n_dev) for d in range(n_dev)]  # recv from d-1
    bwd = [(d, (d - 1) % n_dev) for d in range(n_dev)]  # recv from d+1

    def make_window(k):
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(pop_spec, P()),
                 out_specs=pop_spec,
                 check_vma=False)
        def local_window(f, t0):
            idx = jax.lax.axis_index(AXIS_Y)
            up = jax.lax.ppermute(f[:, -K:, :], AXIS_Y, fwd)
            dn = jax.lax.ppermute(f[:, :K, :], AXIS_Y, bwd)
            fe = jnp.concatenate([up, f, dn], axis=1)
            none = jnp.asarray(-1.0, jnp.float32)
            b_row = jnp.where(idx == 0, jnp.asarray(float(K), jnp.float32),
                              none)
            l_row = jnp.where(idx == n_dev - 1,
                              jnp.asarray(float(K + rows - 1), jnp.float32),
                              none)
            fe = collide_stream_cavity_multistep_gated(
                fe, t0, jnp.stack([b_row, l_row]), k_steps=k, **phys)
            return fe[:, K:-K, :]

        return local_window

    win_full = make_window(K)
    rem = n % K if n > 0 else 0
    win_rem = make_window(rem) if rem else None
    full = n // K

    def rollout(state):
        def win(c, local, k):
            f, t = c
            return (local(f, t), t + k)

        c = (state.f, state.step)
        if full:
            def body(c, _):
                return win(c, win_full, K), None
            c, _ = jax.lax.scan(body, c, None, length=full)
        if rem:
            c = win(c, win_rem, rem)
        f, t = c
        rho, ux, uy = macros_of(cfg, f)
        return CavityState(f=f, rho=rho, ux=ux, uy=uy, step=t)

    shardings = CavityState(
        f=NamedSharding(mesh, pop_spec),
        rho=NamedSharding(mesh, fld_spec), ux=NamedSharding(mesh, fld_spec),
        uy=NamedSharding(mesh, fld_spec),
        step=NamedSharding(mesh, P()),
    )
    return jax.jit(rollout, in_shardings=(shardings,),
                   out_shardings=shardings)


def make_fused_sharded_step_auto(
    cfg: PlasmaConfig,
    devices,
    interpret: bool | None = None,
):
    """Pick the 2-D plasma lattice decomposition for a flat device list
    (the 2-D analog of make_fused_sharded_step3d_auto), in preference
    order:

      1. 1-D (dy) row sharding with the fused halo kernel — the cheapest
         protocol — when the BC/solver allow it (periodic, FFT/NONE),
         NY divides 8*n, and the per-shard band fits VMEM;
      2. a (dy, dx) 2-D mesh with the corner-complete halo2d kernel,
         trying dy descending so shards stay row-major-contiguous;
      3. GSPMD over the jnp step — any solver (GS/SOR/NPS too) and
         bounce-back walls, at jnp speed.

    Returns ``(step, mesh, shardings)`` like the 3-D picker. Raises
    ValueError when no decomposition divides the grid.
    """
    import numpy as np

    from ..kernels.fused_step import _pick_band
    from . import sharding as gspmd

    devs = list(devices)
    n = len(devs)
    if n < 2:
        raise ValueError("auto sharding needs >= 2 devices")
    itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize

    def feasible(ny_l, nx_l):
        try:
            _pick_band(ny_l, nx_l, itemsize)
            return True
        except ValueError:
            return False

    def result(step, mesh, pop_spec, fld_spec):
        sh_pop = NamedSharding(mesh, pop_spec)
        sh_fld = NamedSharding(mesh, fld_spec)
        shardings = PlasmaState(
            f=sh_pop, g=sh_pop, Ex=sh_fld, Ey=sh_fld, phi=sh_fld,
            step=NamedSharding(mesh, P()))
        return step, mesh, shardings

    fused_ok = (cfg.bc == BC.PERIODIC
                and cfg.poisson in (PoissonSolver.FFT, PoissonSolver.NONE))

    if (fused_ok and cfg.NY % (8 * n) == 0
            and feasible(cfg.NY // n, cfg.NX)):
        mesh = Mesh(np.asarray(devs).reshape(n, 1), (AXIS_Y, AXIS_X))
        return result(make_fused_sharded_step(cfg, mesh, interpret=interpret),
                      mesh, P(None, None, AXIS_Y, None), P(AXIS_Y, None))

    if fused_ok:
        for ny_dev in (d for d in range(n, 1, -1) if n % d == 0):
            nx_dev = n // ny_dev
            if nx_dev < 2:
                continue  # (n, 1) already rejected above
            if cfg.NY % (8 * ny_dev) or cfg.NX % (8 * nx_dev):
                continue
            if not feasible(cfg.NY // ny_dev, cfg.NX // nx_dev):
                continue
            mesh = Mesh(np.asarray(devs).reshape(ny_dev, nx_dev),
                        (AXIS_Y, AXIS_X))
            return result(
                make_fused_sharded_step_2d(cfg, mesh, interpret=interpret),
                mesh, P(None, None, AXIS_Y, AXIS_X), P(AXIS_Y, AXIS_X))

    for ny_dev in (d for d in range(n, 0, -1) if n % d == 0):
        nx_dev = n // ny_dev
        if cfg.NY % ny_dev or cfg.NX % nx_dev:
            continue
        mesh = Mesh(np.asarray(devs).reshape(ny_dev, nx_dev),
                    (AXIS_Y, AXIS_X))
        step = gspmd.make_sharded_step(
            _dc.replace(cfg, backend="jnp"), mesh)
        return result(step, mesh, P(None, None, AXIS_Y, AXIS_X),
                      P(AXIS_Y, AXIS_X))

    raise ValueError(
        f"no feasible decomposition of {cfg.NY}x{cfg.NX} over {n} devices: "
        f"no mesh factorization divides the grid")
