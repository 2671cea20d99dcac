"""Full-pipeline parity of the JAX engine vs. the numpy oracle.

This is the TPU-build equivalent of the reference's stage-by-stage debug-dump
harness (old codes/Plasma debug, SURVEY.md section 4.2): small grids, several
steps, every solver/BC combination, float64.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma

import oracle


def _cfg(**kw):
    base = dict(NX=12, NY=12, nsteps=5, dtype=jnp.float64,
                poisson_max_iter=60)  # few sweeps: parity, not convergence
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def _run_both(cfg, nsteps):
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    o = oracle.Oracle(cfg)
    for _ in range(nsteps):
        state = step(state)
        o.step()
    return state, o


def _assert_close(state, o, rtol, atol_scale=1e-12):
    for k, s in enumerate("ein"):
        scale = max(np.abs(o.f[s]).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(state.f[k]), o.f[s], rtol=rtol, atol=atol_scale * scale,
            err_msg=f"f_{s}")
        gscale = max(np.abs(o.g[s]).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(state.g[k]), o.g[s], rtol=rtol, atol=atol_scale * gscale,
            err_msg=f"g_{s}")
    e_atol = 1e-12 * max(np.abs(o.Ex).max(), np.abs(o.Ey).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(state.Ex), o.Ex, rtol=rtol, atol=e_atol)
    np.testing.assert_allclose(np.asarray(state.Ey), o.Ey, rtol=rtol, atol=e_atol)


def test_init_matches_oracle():
    cfg = _cfg()
    state = plasma.init_state(cfg)
    o = oracle.Oracle(cfg)
    _assert_close(state, o, rtol=0)


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.BOUNCE_BACK])
@pytest.mark.parametrize("solver", [PoissonSolver.NONE, PoissonSolver.FFT,
                                    PoissonSolver.GS, PoissonSolver.SOR,
                                    PoissonSolver.NPS])
def test_five_steps_all_solvers(solver, bc):
    cfg = _cfg(poisson=solver, bc=bc)
    state, o = _run_both(cfg, 5)
    _assert_close(state, o, rtol=1e-9)


def test_macros_match_oracle_after_steps():
    cfg = _cfg(poisson=PoissonSolver.FFT, bc=BC.PERIODIC)
    state, o = _run_both(cfg, 4)
    o.update_macro()
    mac = plasma.compute_macros(cfg, state)
    for k, s in enumerate("ein"):
        np.testing.assert_allclose(np.asarray(mac.rho[k]), o.rho[s], rtol=1e-9,
                                   atol=1e-12 * max(np.abs(o.rho[s]).max(), 1))
        # velocities come from near-cancelling momentum sums: the engine and
        # the oracle reduce in different orders, so only an absolute gate at
        # the fp-cancellation scale is meaningful for near-zero u.
        np.testing.assert_allclose(np.asarray(mac.ux[k]), o.ux[s], rtol=1e-8,
                                   atol=1e-13)
        np.testing.assert_allclose(np.asarray(mac.T[k]), o.T[s], rtol=1e-9,
                                   atol=1e-12 * max(np.abs(o.T[s]).max(), 1))
    np.testing.assert_allclose(np.asarray(mac.rho_q), o.rho_q, rtol=1e-8,
                               atol=1e-14)


def test_conservation_periodic_no_field():
    """With periodic BC and no force, each species' mass is conserved."""
    cfg = _cfg(poisson=PoissonSolver.NONE, bc=BC.PERIODIC, Ex_SI=0.0, Ey_SI=0.0,
               NX=16, NY=16)
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    m0 = np.asarray(state.f.sum(axis=(1, 2, 3)))
    for _ in range(10):
        state = step(state)
    m1 = np.asarray(state.f.sum(axis=(1, 2, 3)))
    np.testing.assert_allclose(m1, m0, rtol=1e-12)


def test_guo_force_accelerates_charges():
    """Charged species drift along E; electrons opposite to ions."""
    cfg = _cfg(poisson=PoissonSolver.NONE, bc=BC.PERIODIC, NX=16, NY=16)
    cfg = dataclasses.replace(
        cfg, compat=dataclasses.replace(cfg.compat,
                                        none_solver_kills_external_field=False))
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(10):
        state = step(state)
    mac = plasma.compute_macros(cfg, state)
    cx_e = float(jnp.sum(mac.rho[0] * mac.ux[0]))  # electron x-momentum
    cx_i = float(jnp.sum(mac.rho[1] * mac.ux[1]))
    assert cx_e < 0 < cx_i  # Ex > 0: ions +x, electrons -x
