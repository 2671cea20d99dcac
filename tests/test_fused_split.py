"""A/B split kernels (mass/thermal) vs. the jnp path (interpret mode)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import PlasmaConfig
from lbm_tpu.kernels.fused_split import collide_stream_split
from lbm_tpu.models import plasma
from lbm_tpu.ops.collide import collide
from lbm_tpu.ops.macros import update_macro
from lbm_tpu.ops.stream import stream_periodic


@pytest.mark.parametrize("band", [8, 16])
def test_split_matches_jnp(band):
    cfg = dataclasses.replace(PlasmaConfig(), NX=24, NY=32, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(2):
        state = step(state)

    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb)
    mac = update_macro(state.f, state.g, state.Ex, state.Ey,
                       q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i)
    f_ref, g_ref = collide(state.f, state.g, mac, state.Ex, state.Ey, **kw)
    f_ref, g_ref = stream_periodic(f_ref), stream_periodic(g_ref)

    f_k, g_k, rq_k = collide_stream_split(
        state.f, state.g, state.Ex, state.Ey, interpret=True, band=band, **kw)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_ref),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(rq_k), np.asarray(mac.rho_q),
                               rtol=1e-12, atol=0)
