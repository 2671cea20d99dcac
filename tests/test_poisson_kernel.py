"""The VMEM-resident iterative-solve kernel (kernels/poisson_iter.py).

Contract: interpret mode is BITWISE against the jnp sweeps
(ops/poisson.solve_gs / solve_9point) — same algebra, same mask orders,
same do-style while_loop — for every solver x BC, including the
stopping rule (tol early-exit changes phi; an off-by-one sweep count
would show here). conftest runs these f64 on CPU.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.kernels import poisson_iter
from lbm_tpu.models import plasma
from lbm_tpu.ops import poisson as P


def _fields(NY, NX, seed):
    rng = np.random.default_rng(seed)
    rho = 0.1 * rng.random((NY, NX))
    rho -= rho.mean()
    phi0 = 0.05 * rng.random((NY, NX))
    return jnp.asarray(phi0), jnp.asarray(rho)


@pytest.mark.parametrize("kind,omega", [("gs", None), ("gs", 1.7),
                                        ("nps", None)])
@pytest.mark.parametrize("interior_only", [False, True])
def test_kernel_bitwise_vs_jnp_sweeps(kind, omega, interior_only):
    phi0, rho = _fields(16, 24, seed=3)
    spec = (kind, omega, 60, 0.0, interior_only)
    got = poisson_iter.solve_iter_tpu(phi0, rho, spec=spec, interpret=True)
    if kind == "gs":
        want = P.solve_gs(phi0, rho, periodic=not interior_only,
                          max_iter=60, tol=0.0, omega=omega)
    else:
        want = P.solve_9point(phi0, rho, periodic=not interior_only,
                              max_iter=60, tol=0.0)
    assert jnp.array_equal(got, want), float(jnp.abs(got - want).max())


def test_kernel_tol_early_exit_matches_jnp():
    """The maxErr < tol stop must fire after the SAME sweep count as the
    jnp while_loop — phi differs per sweep, so any off-by-one shows."""
    phi0, rho = _fields(16, 16, seed=4)
    for tol in (1e-3, 1e-5, 1e-7):
        got = poisson_iter.solve_iter_tpu(
            phi0, rho, spec=("gs", None, 5000, tol, False), interpret=True)
        want = P.solve_gs(phi0, rho, periodic=True, max_iter=5000, tol=tol)
        assert jnp.array_equal(got, want), tol


def test_kernel_warm_start_matters():
    """phi0 must actually seed the sweep (the reference's static phi)."""
    phi0, rho = _fields(16, 16, seed=5)
    spec = ("gs", None, 3, 0.0, False)
    a = poisson_iter.solve_iter_tpu(phi0, rho, spec=spec, interpret=True)
    b = poisson_iter.solve_iter_tpu(jnp.zeros_like(phi0), rho, spec=spec,
                                    interpret=True)
    assert not jnp.array_equal(a, b)


def test_vmem_admission():
    assert poisson_iter.check_vmem_iter(1024, 1024, 4)
    assert not poisson_iter.check_vmem_iter(2048, 2048, 4)
    with pytest.raises(ValueError, match="VMEM budget"):
        poisson_iter.solve_iter_tpu(
            jnp.zeros((2048, 2048), jnp.float32),
            jnp.zeros((2048, 2048), jnp.float32),
            spec=("gs", None, 10, 0.0, False), interpret=True)


@pytest.mark.parametrize("sol", [PoissonSolver.GS, PoissonSolver.SOR,
                                 PoissonSolver.NPS])
@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.BOUNCE_BACK])
def test_step_iter_engine_bitwise_vs_jnp_backend(sol, bc):
    """5 full plasma steps: fused backend + iter_engine='pallas' vs the
    jnp backend — trajectory bitwise in f64 interpret, E fields
    included (the kernel returns phi only; E rides the shared jnp path,
    models/plasma._solve_poisson)."""
    base = dict(NX=24, NY=16, nsteps=5, dtype=jnp.float64, poisson=sol,
                bc=bc, poisson_max_iter=40)
    cfg_j = dataclasses.replace(PlasmaConfig(), backend="jnp", **base)
    cfg_k = dataclasses.replace(PlasmaConfig(), backend="fused",
                                kernel_interpret=True,
                                iter_engine="pallas", **base)
    assert plasma._use_pallas_iter(cfg_k, (16, 24))
    assert not plasma._use_pallas_iter(cfg_j, (16, 24))
    # "auto" resolution (v5e ledger 2026-08-20, docs/STATUS.md round 4):
    # kernel backends + f32 + VMEM-fit + real accelerator (or interpret).
    # These f64 parity cfgs stay on the xla path under auto (Mosaic
    # can't lower x64 traces); f32 picks the kernel.
    assert not plasma._use_pallas_iter(
        dataclasses.replace(cfg_k, iter_engine="auto"), (16, 24))
    cfg_f32 = dataclasses.replace(cfg_k, iter_engine="auto",
                                  dtype=jnp.float32)
    assert plasma._use_pallas_iter(cfg_f32, (16, 24))
    # the jnp backend keeps xla even in f32 auto
    assert not plasma._use_pallas_iter(
        dataclasses.replace(cfg_j, iter_engine="auto", dtype=jnp.float32),
        (16, 24))
    # past the VMEM budget auto falls back instead of raising
    assert not plasma._use_pallas_iter(cfg_f32, (4096, 4096))
    sj, sk = plasma.init_state(cfg_j), plasma.init_state(cfg_k)
    stj = jax.jit(plasma.make_step(cfg_j))
    stk = jax.jit(plasma.make_step(cfg_k))
    for _ in range(5):
        sj, sk = stj(sj), stk(sk)
    for name in ("f", "g", "Ex", "Ey", "phi"):
        a, b = getattr(sj, name), getattr(sk, name)
        assert jnp.array_equal(a, b), (name, float(jnp.abs(a - b).max()))


def test_iter_engine_validation():
    with pytest.raises(ValueError, match="iter_engine"):
        dataclasses.replace(PlasmaConfig(), iter_engine="vmem")
    cfg = dataclasses.replace(PlasmaConfig(), NX=4096, NY=4096,
                              poisson=PoissonSolver.GS,
                              iter_engine="pallas")
    with pytest.raises(ValueError, match="VMEM budget"):
        plasma._use_pallas_iter(cfg, (4096, 4096))
