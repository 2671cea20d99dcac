"""Pallas fused collide kernel vs. the jnp reference path (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.kernels.collide_pallas import fused_collide
from lbm_tpu.models import plasma
from lbm_tpu.ops.collide import collide
from lbm_tpu.ops.macros import update_macro


def _setup(nx=16, ny=16, steps=2):
    cfg = dataclasses.replace(PlasmaConfig(), NX=nx, NY=ny, dtype=jnp.float64,
                              poisson=PoissonSolver.FFT)
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(steps):  # evolve a bit so fields are nontrivial
        state = step(state)
    return cfg, state


def test_fused_collide_matches_jnp():
    cfg, state = _setup()
    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb)
    mac = update_macro(state.f, state.g, state.Ex, state.Ey,
                       q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i)
    f_ref, g_ref = collide(state.f, state.g, mac, state.Ex, state.Ey, **kw)
    f_k, g_k, rq_k = fused_collide(state.f, state.g, state.Ex, state.Ey,
                                   interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(np.asarray(rq_k), np.asarray(mac.rho_q),
                               rtol=1e-13, atol=0)


def test_fused_collide_multitile():
    """Grid larger than one tile: block decomposition must be seamless."""
    cfg, state = _setup(nx=32, ny=24, steps=1)
    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb)
    mac = update_macro(state.f, state.g, state.Ex, state.Ey,
                       q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i)
    f_ref, g_ref = collide(state.f, state.g, mac, state.Ex, state.Ey, **kw)
    f_k, g_k, _ = fused_collide(state.f, state.g, state.Ex, state.Ey,
                                interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-13)


def test_pallas_backend_step_matches_jnp_backend():
    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=16, dtype=jnp.float64)
    cfg_p = dataclasses.replace(cfg, backend="pallas")
    s1 = plasma.init_state(cfg)
    s2 = plasma.init_state(cfg_p)
    step1 = jax.jit(plasma.make_step(cfg))
    import unittest.mock as mock
    from lbm_tpu.kernels import collide_pallas as cp
    # force interpret mode on CPU
    orig = cp.fused_collide

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(cp, "fused_collide", interp):
        step2 = jax.jit(plasma.make_step(cfg_p))
        for _ in range(3):
            s1 = step1(s1)
            s2 = step2(s2)
    np.testing.assert_allclose(np.asarray(s2.f), np.asarray(s1.f), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.g), np.asarray(s1.g), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s2.Ex), np.asarray(s1.Ex),
                               rtol=1e-10, atol=1e-18)
