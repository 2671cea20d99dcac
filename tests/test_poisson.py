"""Poisson solver checks: manufactured solutions + oracle agreement."""
import jax.numpy as jnp
import numpy as np

from lbm_tpu.ops import poisson as P

import oracle


def _manufactured(NY, NX):
    """rho_q such that the discrete 5-point Laplacian of phi equals -rho_q."""
    y, x = np.meshgrid(np.arange(NY), np.arange(NX), indexing="ij")
    phi = (np.sin(2 * np.pi * 3 * x / NX) * np.cos(2 * np.pi * 2 * y / NY)
           + 0.3 * np.sin(2 * np.pi * 5 * y / NY))
    lap = (np.roll(phi, -1, 1) + np.roll(phi, 1, 1)
           + np.roll(phi, -1, 0) + np.roll(phi, 1, 0) - 4 * phi)
    return phi - phi.mean(), -lap


def test_fft_manufactured_solution():
    for NY, NX in [(32, 32), (16, 48)]:
        phi_true, rho = _manufactured(NY, NX)
        phi = np.asarray(P.solve_fft(jnp.asarray(rho)))
        np.testing.assert_allclose(phi, phi_true, atol=1e-10)


def test_fft_matches_oracle_full_fft():
    rng = np.random.default_rng(8)
    rho = rng.random((12, 20))
    rho -= rho.mean()
    mine = np.asarray(P.solve_fft(jnp.asarray(rho)))
    o = oracle.Oracle.__new__(oracle.Oracle)
    o.rho_q = rho
    o.phi = np.zeros_like(rho)
    o._solve_fft()
    np.testing.assert_allclose(mine, o.phi, atol=1e-12)


def test_gs_dirichlet_matches_oracle():
    rng = np.random.default_rng(9)
    rho = 0.1 * rng.random((8, 8))
    phi0 = np.zeros_like(rho)
    mine = np.asarray(
        P.solve_gs(jnp.asarray(phi0), jnp.asarray(rho), periodic=False,
                   max_iter=200, tol=0.0)
    )
    o = oracle.Oracle.__new__(oracle.Oracle)
    import dataclasses
    from lbm_tpu.config import PlasmaConfig
    o.cfg = dataclasses.replace(PlasmaConfig(), poisson_max_iter=200, poisson_tol=0.0)
    o.rho_q = rho
    o.phi = phi0.copy()
    o._solve_gs(omega=None)
    np.testing.assert_allclose(mine, o.phi, rtol=1e-12, atol=1e-15)


def test_sor_dirichlet_matches_oracle():
    rng = np.random.default_rng(10)
    rho = 0.1 * rng.random((9, 7))
    phi0 = np.zeros_like(rho)
    mine = np.asarray(
        P.solve_gs(jnp.asarray(phi0), jnp.asarray(rho), periodic=False,
                   omega=1.8, max_iter=150, tol=0.0)
    )
    o = oracle.Oracle.__new__(oracle.Oracle)
    import dataclasses
    from lbm_tpu.config import PlasmaConfig
    o.cfg = dataclasses.replace(PlasmaConfig(), poisson_max_iter=150, poisson_tol=0.0)
    o.rho_q = rho
    o.phi = phi0.copy()
    o._solve_gs(omega=1.8)
    np.testing.assert_allclose(mine, o.phi, rtol=1e-12, atol=1e-15)


def test_9point_dirichlet_matches_oracle():
    rng = np.random.default_rng(11)
    rho = 0.1 * rng.random((8, 8))
    phi0 = np.zeros_like(rho)
    mine = np.asarray(
        P.solve_9point(jnp.asarray(phi0), jnp.asarray(rho), periodic=False,
                       max_iter=120, tol=0.0)
    )
    o = oracle.Oracle.__new__(oracle.Oracle)
    import dataclasses
    from lbm_tpu.config import PlasmaConfig
    o.cfg = dataclasses.replace(PlasmaConfig(), poisson_max_iter=120, poisson_tol=0.0)
    o.rho_q = rho
    o.phi = phi0.copy()
    o._solve_9point()
    np.testing.assert_allclose(mine, o.phi, rtol=1e-12, atol=1e-15)


def test_gs_converges_to_discrete_solution():
    """Dirichlet GS should solve the 5-point system A phi = rho on the interior."""
    rng = np.random.default_rng(12)
    rho = rng.random((10, 10)) * 0.01
    phi = np.asarray(
        P.solve_gs(jnp.zeros((10, 10)), jnp.asarray(rho), periodic=False,
                   max_iter=20000, tol=1e-14)
    )
    res = (np.roll(phi, -1, 1) + np.roll(phi, 1, 1) + np.roll(phi, -1, 0)
           + np.roll(phi, 1, 0) - 4 * phi + rho)[1:-1, 1:-1]
    assert np.abs(res).max() < 1e-10
    assert np.abs(phi[0]).max() == 0 and np.abs(phi[-1]).max() == 0


def test_efield_periodic_and_neumann_match_oracle():
    rng = np.random.default_rng(13)
    phi = rng.random((9, 11))
    Exp, Eyp = (np.asarray(a) for a in P.efield_periodic(jnp.asarray(phi)))
    o = oracle.Oracle.__new__(oracle.Oracle)
    o.phi = phi
    o._efield_periodic()
    np.testing.assert_allclose(Exp, o.Ex, atol=1e-15)
    np.testing.assert_allclose(Eyp, o.Ey, atol=1e-15)

    Exn, Eyn = (np.asarray(a) for a in P.efield_neumann(jnp.asarray(phi)))
    o2 = oracle.Oracle.__new__(oracle.Oracle)
    o2.phi = phi
    o2.Ex = np.zeros_like(phi)  # reference overwrites all entries eventually
    o2.Ey = np.zeros_like(phi)
    o2._efield_neumann()
    np.testing.assert_allclose(Exn, o2.Ex, atol=1e-15)
    np.testing.assert_allclose(Eyn, o2.Ey, atol=1e-15)


def test_packed_rfft2_matches_jnp():
    """The packed-halves transform is exact real-FFT algebra; it must agree
    with jnp.fft.rfft2/irfft2 to roundoff at any even size and dtype."""
    rng = np.random.default_rng(11)
    for (NY, NX) in [(16, 32), (64, 64), (128, 48), (34, 20)]:
        for dt, tol in [(np.float64, 1e-11), (np.float32, 1e-4)]:
            x = jnp.asarray(rng.standard_normal((NY, NX)).astype(dt))
            got = P._rfft2_packed(x)
            ref = jnp.fft.rfft2(x)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=tol * NY)
            back = P._irfft2_packed(got, (NY, NX))
            np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                                       atol=tol)


def test_solve_fft_packed_path_matches_plain():
    """Above the size gate solve_fft switches to the packed transform; the
    result must match the plain-rfft2 solve to roundoff."""
    rng = np.random.default_rng(12)
    NY = NX = 64
    rho = jnp.asarray(rng.standard_normal((NY, NX)))
    plain = P.solve_fft(rho)
    old = P._PACKED_FFT_MIN_SITES
    try:
        P._PACKED_FFT_MIN_SITES = 0   # force the packed path at test size
        packed = P.solve_fft(rho)
    finally:
        P._PACKED_FFT_MIN_SITES = old
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain),
                               atol=1e-11)


def test_spectral_efield_matches_roll_efield():
    """solve_fft_efield computes E via the exact k-space symbol of the
    central-difference stencil; it must match solve_fft + efield_periodic
    to transform roundoff (f64 <=1e-13 rel; f32 a few FFT ulps of the
    field scale — measured 2e-5 at 2048^2, 1e-6 at 96^2), on both the
    plain and packed transform paths."""
    rng = np.random.default_rng(13)
    for NY, NX in [(32, 32), (64, 48), (200, 200)]:
        rho = jnp.asarray(rng.standard_normal((NY, NX)) * 1e-8)
        Ex, Ey = P.efield_periodic(P.solve_fft(rho))
        Ex2, Ey2 = P.solve_fft_efield(rho)
        scale = float(jnp.abs(Ex).max())
        np.testing.assert_allclose(np.asarray(Ex2), np.asarray(Ex),
                                   atol=1e-13 * scale)
        np.testing.assert_allclose(np.asarray(Ey2), np.asarray(Ey),
                                   atol=1e-13 * scale)
    # packed path (forced via the size gate)
    old = P._PACKED_FFT_MIN_SITES
    try:
        P._PACKED_FFT_MIN_SITES = 0
        rho = jnp.asarray(rng.standard_normal((64, 64)) * 1e-8)
        Ex, Ey = P.efield_periodic(P.solve_fft(rho))
        Ex2, Ey2 = P.solve_fft_efield(rho)
    finally:
        P._PACKED_FFT_MIN_SITES = old
    scale = float(jnp.abs(Ex).max())
    np.testing.assert_allclose(np.asarray(Ex2), np.asarray(Ex),
                               atol=1e-13 * scale)
    np.testing.assert_allclose(np.asarray(Ey2), np.asarray(Ey),
                               atol=1e-13 * scale)
