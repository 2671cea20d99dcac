"""D3Q19 3-D plasma column tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.constants import D3Q19
from lbm_tpu.models import plasma3d


def _cfg(**kw):
    base = dict(NX=12, NY=12, NZ=8, nsteps=3, dtype=jnp.float64)
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def test_d3q19_stencil():
    assert D3Q19.Q == 19
    assert abs(D3Q19.W.sum() - 1.0) < 1e-15
    c = np.stack([D3Q19.CX, D3Q19.CY, D3Q19.CZ])
    # opposite-direction table is involutive and negates velocities
    assert (D3Q19.OPP[D3Q19.OPP] == np.arange(19)).all()
    assert (c[:, D3Q19.OPP] == -c).all()
    # isotropy: sum w c_a c_b = cs2 delta_ab
    for a in range(3):
        for b in range(3):
            m = (D3Q19.W * c[a] * c[b]).sum()
            expect = 1.0 / 3.0 if a == b else 0.0
            assert abs(m - expect) < 1e-15


def test_equilibrium_moments_3d():
    rng = np.random.default_rng(0)
    shape = (4, 5, 6)
    rho = 1.0 + rng.random(shape)
    u = [0.05 * (2 * rng.random(shape) - 1) for _ in range(3)]
    eq = np.asarray(plasma3d._equilibrium(
        jnp.asarray(rho), *(jnp.asarray(x) for x in u), 1.0 / 3.0,
        jnp.float64))
    np.testing.assert_allclose(eq.sum(0), rho, rtol=1e-12)
    for comp, cvec in zip(u, (D3Q19.CX, D3Q19.CY, D3Q19.CZ)):
        mom = (eq * cvec.astype(float)[:, None, None, None]).sum(0)
        np.testing.assert_allclose(mom, rho * comp, rtol=1e-9, atol=1e-13)


def test_streaming_conserves_and_shifts():
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.random((19, 4, 5, 6)))
    out = plasma3d.stream_periodic(f)
    assert abs(float(out.sum() - f.sum())) < 1e-12
    # direction 1 (+x): shifted by one in x
    np.testing.assert_array_equal(np.asarray(out[1]),
                                  np.roll(np.asarray(f[1]), 1, axis=-1))
    # direction 5 (+z)
    np.testing.assert_array_equal(np.asarray(out[5]),
                                  np.roll(np.asarray(f[5]), 1, axis=0))


def test_fft3d_manufactured():
    NZ, NY, NX = 8, 12, 16
    z, y, x = np.meshgrid(np.arange(NZ), np.arange(NY), np.arange(NX),
                          indexing="ij")
    phi = (np.sin(2 * np.pi * 2 * x / NX) * np.cos(2 * np.pi * y / NY)
           * np.sin(2 * np.pi * 3 * z / NZ))
    lap = sum(np.roll(phi, s, a) for a in range(3) for s in (1, -1)) - 6 * phi
    phi0 = phi - phi.mean()
    got = np.asarray(plasma3d.solve_fft3d(jnp.asarray(-lap)))
    np.testing.assert_allclose(got, phi0, atol=1e-10)


def test_rfft3_packed_matches_rfftn():
    from lbm_tpu.ops.poisson import _irfft3_packed, _rfft3_packed
    rng = np.random.default_rng(7)
    for shape in [(8, 6, 16), (4, 5, 8), (16, 1, 8)]:
        x = rng.standard_normal(shape)
        h = np.asarray(_rfft3_packed(jnp.asarray(x)))
        ref = np.fft.rfftn(x)
        assert abs(h - ref).max() / abs(ref).max() < 1e-13
        back = np.asarray(_irfft3_packed(jnp.asarray(h), s=shape))
        assert abs(back - x).max() < 1e-13


def test_solve_fft3d_packed_gate_equivalent(monkeypatch):
    """The packed route (taken for big volumes) solves identically."""
    rng = np.random.default_rng(8)
    rho = jnp.asarray(rng.standard_normal((8, 12, 16)) * 1e-8)
    plain = np.asarray(plasma3d.solve_fft3d(rho))
    monkeypatch.setattr(plasma3d, "_PACKED_FFT3_MIN_SITES", 0)
    packed = np.asarray(plasma3d.solve_fft3d(rho))
    np.testing.assert_allclose(packed, plain, rtol=0, atol=1e-19)


def test_three_steps_finite_and_conserving():
    cfg = _cfg(poisson=PoissonSolver.FFT)
    s = plasma3d.init_state(cfg)
    m0 = float(s.f[2].sum())  # neutral mass
    step = jax.jit(plasma3d.make_step(cfg))
    for _ in range(3):
        s = step(s)
    assert bool(jnp.isfinite(s.f).all() & jnp.isfinite(s.g).all())
    assert abs(float(s.f[2].sum()) - m0) / m0 < 1e-12
    assert int(s.step) == 3


def test_charge_drift_3d():
    cfg = _cfg(poisson=PoissonSolver.NONE)
    cfg = dataclasses.replace(
        cfg, compat=dataclasses.replace(
            cfg.compat, none_solver_kills_external_field=False))
    s = plasma3d.init_state(cfg)
    step = jax.jit(plasma3d.make_step(cfg))
    for _ in range(6):
        s = step(s)
    mac = plasma3d.update_macro(s.f, s.g, s.Ex, s.Ey, s.Ez,
                                q_e=-1.0, q_i=1.0, m_e=1.0,
                                m_i=cfg.units().m_i)
    assert float(jnp.sum(mac.rho[0] * mac.ux[0])) < 0  # electrons -x
    assert float(jnp.sum(mac.rho[1] * mac.ux[1])) > 0  # ions +x


def test_fused3d_kernel_matches_jnp():
    """The 3-D fused collide+stream kernel (interpret mode) must reproduce
    the jnp step bitwise — the shared ops/d3.py operators guarantee the
    same per-cell arithmetic; this pins the z-pipeline/wrap bookkeeping."""
    cfg_k = _cfg(NX=16, NY=16, NZ=8, backend="fused", kernel_interpret=True,
                 poisson=PoissonSolver.FFT)
    cfg_r = dataclasses.replace(cfg_k, backend="jnp")
    s_k = plasma3d.init_state(cfg_k)
    s_r = plasma3d.init_state(cfg_r)
    step_k = jax.jit(plasma3d.make_step(cfg_k))
    step_r = jax.jit(plasma3d.make_step(cfg_r))
    for t in range(3):
        s_k = step_k(s_k)
        s_r = step_r(s_r)
        np.testing.assert_array_equal(np.asarray(s_k.f), np.asarray(s_r.f),
                                      err_msg=f"f step {t}")
        np.testing.assert_array_equal(np.asarray(s_k.g), np.asarray(s_r.g),
                                      err_msg=f"g step {t}")
        np.testing.assert_array_equal(np.asarray(s_k.Ex), np.asarray(s_r.Ex))


def test_fused3d_single_slice_grid():
    """NZ == 1 degenerate wrap: every z-neighbor is the slice itself."""
    cfg_k = _cfg(NX=16, NY=16, NZ=1, backend="fused", kernel_interpret=True,
                 poisson=PoissonSolver.FFT)
    cfg_r = dataclasses.replace(cfg_k, backend="jnp")
    s_k = plasma3d.init_state(cfg_k)
    s_r = plasma3d.init_state(cfg_r)
    s_k = jax.jit(plasma3d.make_step(cfg_k))(s_k)
    s_r = jax.jit(plasma3d.make_step(cfg_r))(s_r)
    np.testing.assert_array_equal(np.asarray(s_k.f), np.asarray(s_r.f))
    np.testing.assert_array_equal(np.asarray(s_k.g), np.asarray(s_r.g))
