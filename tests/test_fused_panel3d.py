"""Y-paneled 3-D kernel vs the jnp step (interpret mode).

The panel kernel covers cross-sections past the split pair's VMEM budget
by colliding (ty, NX) y-panels plus a redundantly-collided 1-row halo
slab per side, substituting the panel-boundary rows in-register. Same
contracts as the single kernel: bitwise in f64; f bitwise + g within
the approx-reciprocal tolerance in bf16 mode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.kernels.fused_panel3d import (collide_stream_panel3d,
                                           pick_panel3d)
from lbm_tpu.models import plasma3d


def _cfg(**kw):
    base = dict(NX=12, NY=16, NZ=5, dtype=jnp.float64,
                poisson=PoissonSolver.FFT, neutral_delta=True)
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def _panel_step(cfg, s, ty):
    u = cfg.units()
    return collide_stream_panel3d(
        s.f, s.g, s.Ex, s.Ey, s.Ez, taus=cfg.taus, q_e=u.q_e, q_i=u.q_i,
        m_e=u.m_e, m_i=u.m_i, cs2=u.cs2, kb=u.kb, interpret=True,
        neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0, panel=ty)


@pytest.mark.parametrize("delta", [False, True])
def test_panel3d_matches_jnp_f64(delta):
    cfg = _cfg(neutral_delta=delta)
    s = plasma3d.init_state(cfg)
    step_j = jax.jit(plasma3d.make_step(cfg))
    for t in range(2):
        f_n, g_n, rq = _panel_step(cfg, s, ty=8)   # 2 panels of 8 rows
        s = step_j(s)
        np.testing.assert_allclose(np.asarray(s.f), np.asarray(f_n),
                                   rtol=1e-12, atol=1e-18,
                                   err_msg=f"f step {t}")
        np.testing.assert_allclose(np.asarray(s.g), np.asarray(g_n),
                                   rtol=1e-12, atol=0, err_msg=f"g step {t}")


def test_panel3d_rejects_unaligned_panel():
    """An explicit panel= override must be sublane-aligned (multiple of
    8) — Mosaic would otherwise reject the block layout with an opaque
    lowering error."""
    cfg = _cfg(NY=24)
    s = plasma3d.init_state(cfg)
    with pytest.raises(ValueError, match="multiple of 8"):
        _panel_step(cfg, s, ty=12)


def test_panel3d_single_panel_degenerates_to_whole_slice():
    """P = 1: the strips wrap onto the panel itself (periodic NY); the
    result must still match the jnp step exactly."""
    cfg = _cfg(NY=8, NZ=4)
    s = plasma3d.init_state(cfg)
    f_n, g_n, rq = _panel_step(cfg, s, ty=8)
    s2 = jax.jit(plasma3d.make_step(cfg))(s)
    np.testing.assert_allclose(np.asarray(s2.f), np.asarray(f_n),
                               rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(np.asarray(s2.g), np.asarray(g_n),
                               rtol=1e-12, atol=0)


def test_panel3d_bf16_f_bitwise():
    cfg = _cfg(dtype=jnp.float32, storage="bf16")
    s = plasma3d.init_state(cfg)
    step_j = jax.jit(plasma3d.make_step(cfg))
    f_n, g_n, rq = _panel_step(cfg, s, ty=8)
    s2 = step_j(s)
    assert f_n.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(s2.f, dtype=np.float64),
                          np.asarray(f_n, dtype=np.float64))
    a = np.asarray(s2.g, np.float64)
    b = np.asarray(g_n, np.float64)
    for sp in range(3):
        scale = np.abs(a[sp]).max()
        assert np.abs(a[sp] - b[sp]).max() <= 2e-2 * scale


def test_panel3d_covers_512_cross_section():
    """512^2 cross-sections must be admitted (bf16 and f32) with a panel
    height that divides NY."""
    ty_bf16 = pick_panel3d(512, 512, 2)
    ty_f32 = pick_panel3d(512, 512, 4)
    assert 512 % ty_bf16 == 0 and ty_bf16 >= 32
    assert 512 % ty_f32 == 0 and ty_f32 >= 16
    # 1024^2 bf16 too
    assert 1024 % pick_panel3d(1024, 1024, 2) == 0


def test_make_step_falls_back_to_panel():
    """A cross-section too wide for single AND split kernels must route to
    the panel path without warning or error."""
    import warnings

    from lbm_tpu.kernels.fused_split3d import check_vmem_split3d

    n = 256
    while True:
        try:
            check_vmem_split3d(n, n, 4)
            n += 64
        except ValueError:
            break
    pick_panel3d(n, n, 4)   # must not raise
    cfg = _cfg(NX=n, NY=n, NZ=1, dtype=jnp.float32, backend="fused",
               kernel_interpret=True)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        plasma3d.make_step(cfg)
