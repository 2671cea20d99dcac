"""Neutral delta-storage mode (cfg.neutral_delta).

f[2] holds deviations from the uniform background rho_n_init * w_i. The
dynamics are algebraically identical to the classic layout (ops/collide.py
delta form), so in f64 the two layouts must track each other to rounding;
in f32 the delta layout must rescue the neutral velocity/thermal channel,
which the classic layout loses entirely to rho_n ~ 1.8e10 cancellation
(docs/STATUS.md drift table; reference fragility SURVEY.md section 7.3.4).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma


def _run_macros(n, steps, dtype, delta, bc=BC.PERIODIC, backend="jnp",
                interpret=False):
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=n, NY=n, nsteps=steps, dtype=dtype, bc=bc,
        poisson=PoissonSolver.FFT, neutral_delta=delta, backend=backend,
        kernel_interpret=interpret)
    s = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(steps):
        s = step(s)
    return plasma.compute_macros(cfg, s), s


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.BOUNCE_BACK])
def test_delta_matches_classic_f64(bc):
    """Same trajectory as the classic layout in f64 (to rounding; the
    neutral velocity comparison is scale-relative because the CLASSIC
    path carries ~1e-8 of its own f64 cancellation noise there)."""
    m0, _ = _run_macros(32, 10, jnp.float64, False, bc=bc)
    m1, _ = _run_macros(32, 10, jnp.float64, True, bc=bc)
    for name in ("rho", "ux", "uy", "T"):
        a, b = np.asarray(getattr(m0, name)), np.asarray(getattr(m1, name))
        for s in range(3):
            scale = np.abs(a[s]).max()
            tol = 1e-6 if s == 2 else 1e-11
            assert np.abs(a[s] - b[s]).max() <= tol * scale, (
                f"{name}[{s}] delta-vs-classic {np.abs(a[s]-b[s]).max()}"
                f" > {tol} * {scale}")
    np.testing.assert_allclose(np.asarray(m0.rho_q), np.asarray(m1.rho_q),
                               rtol=0, atol=1e-11 * np.abs(m0.rho_q).max())


def test_delta_rescues_neutral_channel_f32():
    """The motivating result: at the golden parameters the classic f32
    neutral velocities/temperature diverge from the f64 truth by >100% of
    scale within 50 steps; the delta layout stays at the ~1e-3 level."""
    truth, _ = _run_macros(64, 50, jnp.float64, True)
    classic, _ = _run_macros(64, 50, jnp.float32, False)
    delta, _ = _run_macros(64, 50, jnp.float32, True)
    for name in ("ux", "uy", "T"):
        t = np.asarray(getattr(truth, name))[2]
        scale = np.abs(t).max()
        e_classic = np.abs(np.asarray(getattr(classic, name))[2] - t).max()
        e_delta = np.abs(np.asarray(getattr(delta, name))[2] - t).max()
        assert e_delta <= 1e-2 * scale, (
            f"neutral {name}: delta-f32 err {e_delta/scale:.3e} of scale")
        assert e_delta < 0.1 * e_classic, (
            f"neutral {name}: delta {e_delta:.3e} not << classic "
            f"{e_classic:.3e}")


def test_fused_kernel_matches_jnp_in_delta_mode():
    """The fused collide+stream kernel (interpret mode) must reproduce the
    jnp delta-mode step exactly — the delta form is part of the shared ops,
    not a jnp-only rewrite."""
    cfg_k = dataclasses.replace(
        PlasmaConfig(), NX=24, NY=32, dtype=jnp.float64, neutral_delta=True,
        backend="fused", kernel_interpret=True)
    cfg_r = dataclasses.replace(cfg_k, backend="jnp")
    s_k = plasma.init_state(cfg_k)
    s_r = plasma.init_state(cfg_r)
    step_k = jax.jit(plasma.make_step(cfg_k))
    step_r = jax.jit(plasma.make_step(cfg_r))
    for t in range(3):
        s_k = step_k(s_k)
        s_r = step_r(s_r)
        np.testing.assert_allclose(np.asarray(s_k.f), np.asarray(s_r.f),
                                   rtol=1e-12, atol=1e-18,
                                   err_msg=f"f step {t}")
        np.testing.assert_allclose(np.asarray(s_k.g), np.asarray(s_r.g),
                                   rtol=1e-12, atol=0, err_msg=f"g step {t}")


def test_mass_and_momentum_conserved_in_delta_mode():
    """Total neutral mass = ref * NY * NX + sum(delta) must be conserved by
    collide+stream (no forcing on neutrals) exactly as in classic mode."""
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=32, NY=32, nsteps=5, dtype=jnp.float64,
        poisson=PoissonSolver.NONE, neutral_delta=True)
    s = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    m0 = float(jnp.sum(s.f[2]))
    for _ in range(5):
        s = step(s)
    m1 = float(jnp.sum(s.f[2]))
    u = cfg.units()
    total = u.rho_n_init * 32 * 32
    assert abs(m1 - m0) <= 1e-12 * total
