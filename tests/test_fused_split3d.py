"""3-D mass/thermal split kernel pair vs the jnp step (interpret mode).

The pair covers cross-sections ~2x the single 3-D kernel's VMEM limit
(one population array + the 12-plane pack per kernel instead of f AND g).
Same contracts as the single kernel: bitwise in f64; f bitwise + g within
the approx-reciprocal tolerance in bf16 mode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.kernels.fused_split3d import (check_vmem_split3d,
                                           collide_stream_split3d)
from lbm_tpu.models import plasma3d


def _cfg(**kw):
    base = dict(NX=12, NY=16, NZ=6, dtype=jnp.float64,
                poisson=PoissonSolver.FFT, neutral_delta=True)
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def _pair_step(cfg, s):
    u = cfg.units()
    return collide_stream_split3d(
        s.f, s.g, s.Ex, s.Ey, s.Ez, taus=cfg.taus, q_e=u.q_e, q_i=u.q_i,
        m_e=u.m_e, m_i=u.m_i, cs2=u.cs2, kb=u.kb, interpret=True,
        neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)


@pytest.mark.parametrize("delta", [False, True])
def test_split3d_matches_jnp_f64(delta):
    cfg = _cfg(neutral_delta=delta)
    s = plasma3d.init_state(cfg)
    step_j = jax.jit(plasma3d.make_step(cfg))
    for t in range(2):
        f_n, g_n, rq = _pair_step(cfg, s)
        s = step_j(s)
        np.testing.assert_allclose(np.asarray(s.f), np.asarray(f_n),
                                   rtol=1e-12, atol=1e-18,
                                   err_msg=f"f step {t}")
        np.testing.assert_allclose(np.asarray(s.g), np.asarray(g_n),
                                   rtol=1e-12, atol=0, err_msg=f"g step {t}")


def test_split3d_bf16_f_bitwise():
    cfg = _cfg(dtype=jnp.float32, storage="bf16")
    s = plasma3d.init_state(cfg)
    step_j = jax.jit(plasma3d.make_step(cfg))
    f_n, g_n, rq = _pair_step(cfg, s)
    s2 = step_j(s)
    assert f_n.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(s2.f, dtype=np.float64),
                          np.asarray(f_n, dtype=np.float64))
    a = np.asarray(s2.g, np.float64)
    b = np.asarray(g_n, np.float64)
    for sp in range(3):
        scale = np.abs(a[sp]).max()
        assert np.abs(a[sp] - b[sp]).max() <= 2e-2 * scale


def test_make_step_falls_back_to_split():
    """A cross-section too wide for the single kernel but fine for the
    split pair must route to the pair (verified by monkeypatch-free
    introspection: the VMEM checks define the boundary)."""
    from lbm_tpu.kernels.fused_step3d import check_vmem3d

    # find a width where single fails but split passes (f32)
    n = 192
    while True:
        try:
            check_vmem3d(n, n, 4)
            n += 32
            continue
        except ValueError:
            break
    check_vmem_split3d(n, n, 4)  # must not raise
    cfg = _cfg(NX=n, NY=n, NZ=1, dtype=jnp.float32, backend="fused",
               kernel_interpret=True)
    # building the step must select the split path without error
    plasma3d.make_step(cfg)


def test_split3d_vmem_rejects_absurd():
    with pytest.raises(ValueError):
        check_vmem_split3d(4096, 4096, 4)
