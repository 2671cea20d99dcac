"""Fused collide+stream kernel vs. the jnp path (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, PlasmaConfig
from lbm_tpu.kernels.fused_step import collide_stream
from lbm_tpu.models import plasma
from lbm_tpu.ops.collide import collide
from lbm_tpu.ops.macros import update_macro
from lbm_tpu.ops.stream import stream_periodic


def _reference(cfg, state):
    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb)
    mac = update_macro(state.f, state.g, state.Ex, state.Ey,
                       q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i)
    f, g = collide(state.f, state.g, mac, state.Ex, state.Ey, **kw)
    return stream_periodic(f), stream_periodic(g), mac.rho_q, kw


@pytest.mark.parametrize("band", [8, 16])
def test_fused_matches_jnp(band):
    ny = 32
    cfg = dataclasses.replace(PlasmaConfig(), NX=24, NY=ny, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(2):
        state = step(state)
    f_ref, g_ref, rq_ref, kw = _reference(cfg, state)
    f_k, g_k, rq_k = collide_stream(state.f, state.g, state.Ex, state.Ey,
                                    interpret=True, band=band, **kw)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(rq_k), np.asarray(rq_ref),
                               rtol=1e-12, atol=0)


def test_single_band_grid():
    """nk == 1: all DMAs drain at the only grid step."""
    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=8, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    f_ref, g_ref, rq_ref, kw = _reference(cfg, state)
    f_k, g_k, _ = collide_stream(state.f, state.g, state.Ex, state.Ey,
                                 interpret=True, band=8, **kw)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-12)


def test_fused_step_bounceback_matches_jnp():
    """backend='fused' + bounce-back: the periodic kernel + edge fixups must
    reproduce the jnp step (incl. the reference's stale-hole quirks) exactly,
    over several steps so the holes' pre/post-collision distinction bites."""
    from lbm_tpu.config import PoissonSolver
    cfg_bb = dataclasses.replace(
        PlasmaConfig(), NX=24, NY=32, dtype=jnp.float64,
        bc=BC.BOUNCE_BACK, backend="fused", kernel_interpret=True,
        poisson=PoissonSolver.SOR)
    cfg_ref = dataclasses.replace(cfg_bb, backend="jnp")
    s_k = plasma.init_state(cfg_bb)
    s_r = plasma.init_state(cfg_ref)
    step_k = jax.jit(plasma.make_step(cfg_bb))
    step_r = jax.jit(plasma.make_step(cfg_ref))
    for t in range(3):
        s_k = step_k(s_k)
        s_r = step_r(s_r)
        np.testing.assert_allclose(np.asarray(s_k.f), np.asarray(s_r.f),
                                   rtol=1e-12, atol=0, err_msg=f"f step {t}")
        np.testing.assert_allclose(np.asarray(s_k.g), np.asarray(s_r.g),
                                   rtol=1e-12, atol=0, err_msg=f"g step {t}")
        np.testing.assert_allclose(np.asarray(s_k.Ex), np.asarray(s_r.Ex),
                                   rtol=1e-12, atol=0)
