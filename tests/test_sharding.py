"""Multi-device sharding: parity with single-device and collective sanity.

Runs on 8 virtual CPU devices (conftest forces
xla_force_host_platform_device_count=8).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma
from lbm_tpu.parallel import mesh as mesh_mod
from lbm_tpu.parallel import sharding as sh


def _cfg(**kw):
    base = dict(NX=32, NY=32, nsteps=3, dtype=jnp.float64)
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def test_factor_2d():
    assert mesh_mod.factor_2d(8) == (2, 4)
    assert mesh_mod.factor_2d(4) == (2, 2)
    assert mesh_mod.factor_2d(7) == (1, 7)
    assert mesh_mod.factor_2d(1) == (1, 1)


@pytest.mark.parametrize("solver", [PoissonSolver.FFT, PoissonSolver.GS,
                                    PoissonSolver.NONE])
def test_sharded_matches_single_device(solver):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = _cfg(poisson=solver)
    m = mesh_mod.make_mesh()          # 2x4 over 8 cpu devices
    sh.validate_grid(cfg, m)

    s_single = plasma.init_state(cfg)
    step1 = jax.jit(plasma.make_step(cfg))
    s_multi = sh.shard_state(plasma.init_state(cfg), m)
    stepN = sh.make_sharded_step(cfg, m, donate=False)

    for _ in range(3):
        s_single = step1(s_single)
        s_multi = stepN(s_multi)

    np.testing.assert_allclose(np.asarray(s_multi.f), np.asarray(s_single.f),
                               rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(np.asarray(s_multi.g), np.asarray(s_single.g),
                               rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(np.asarray(s_multi.Ex), np.asarray(s_single.Ex),
                               rtol=1e-10, atol=1e-16)


def test_sharded_bounceback():
    cfg = _cfg(bc=BC.BOUNCE_BACK, poisson=PoissonSolver.SOR,
               poisson_max_iter=40)
    m = mesh_mod.make_mesh()
    s_single = plasma.init_state(cfg)
    step1 = jax.jit(plasma.make_step(cfg))
    s_multi = sh.shard_state(plasma.init_state(cfg), m)
    stepN = sh.make_sharded_step(cfg, m, donate=False)
    for _ in range(2):
        s_single = step1(s_single)
        s_multi = stepN(s_multi)
    np.testing.assert_allclose(np.asarray(s_multi.f), np.asarray(s_single.f),
                               rtol=1e-12, atol=1e-20)


def test_output_stays_sharded():
    cfg = _cfg()
    m = mesh_mod.make_mesh()
    s = sh.shard_state(plasma.init_state(cfg), m)
    s = sh.make_sharded_step(cfg, m, donate=False)(s)
    assert len(s.f.sharding.device_set) == 8
    assert not s.f.is_fully_replicated


def test_sharded_3d_matches_single_device():
    """3-D (D3Q19) GSPMD step over the (dy, dx) mesh == single device."""
    from lbm_tpu.models import plasma3d

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=16, NZ=4, nsteps=2,
                              dtype=jnp.float64)
    m = mesh_mod.make_mesh()
    s_single = plasma3d.init_state(cfg)
    step1 = jax.jit(plasma3d.make_step(cfg))
    s_multi = sh.shard_state3d(plasma3d.init_state(cfg), m)
    stepN = sh.make_sharded_step3d(cfg, m, donate=False)
    for _ in range(2):
        s_single = step1(s_single)
        s_multi = stepN(s_multi)
    assert len(s_multi.f.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(s_multi.f), np.asarray(s_single.f),
                               rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(np.asarray(s_multi.Ex),
                               np.asarray(s_single.Ex), rtol=1e-11,
                               atol=1e-16)


def test_sharded_cavity_matches_single_device():
    """GSPMD cavity step (the reference's OpenMP-parallel validation
    workload) == single-device step. Not bitwise: the partitioner changes
    the fusion context of the macro sums, flipping last bits (~1e-16
    rel) — same noise class the sharded halo-kernel tests tolerate.
    (The canonical 129^2 Ghia grid itself is odd/indivisible — the
    constructor refuses it with a clear error; see below.)"""
    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity

    cfg = dataclasses.replace(CavityConfig(), NX=32, NY=32, nsteps=20,
                              dtype=jnp.float64)
    mesh = mesh_mod.make_mesh()   # 2x4 over 8 cpu devices

    step_ref = jax.jit(cavity.make_step(cfg))
    step_sh = sh.make_sharded_cavity_step(cfg, mesh, donate=False)
    s_ref = cavity.init_state(cfg)
    s_sh = sh.shard_cavity_state(cavity.init_state(cfg), mesh)
    for _ in range(20):   # through the lid ramp (sigma=10) and past it
        s_ref = step_ref(s_ref)
        s_sh = step_sh(s_sh)
    assert len(s_sh.f.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(s_sh.f), np.asarray(s_ref.f),
                               rtol=1e-14, atol=0)
    np.testing.assert_allclose(np.asarray(s_sh.ux), np.asarray(s_ref.ux),
                               rtol=0, atol=1e-14 * cfg.u_lid)


def test_sharded_cavity_rejects_indivisible_ghia_grid():
    """The canonical Ghia grid (129^2, the CavityConfig default) is odd:
    no multi-device mesh divides it. The constructor must say so clearly
    instead of failing deep inside device_put."""
    from lbm_tpu.config import CavityConfig
    from lbm_tpu.parallel import sharding as _sh

    mesh = mesh_mod.make_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        _sh.make_sharded_cavity_step(CavityConfig(), mesh)
