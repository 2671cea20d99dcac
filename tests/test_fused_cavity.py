"""Fused cavity kernel vs the jnp path.

Both backends call the ops/cavity.py physics verbatim; on TPU the
compiled kernel is held to bitwise equality like the plasma kernels. In
CPU interpret mode (here) the two paths sit in different XLA fusion
contexts whose FMA contraction flips last bits (the same effect
CLAUDE.md documents for the sharded halo paths), so the gates are
rtol=1e-12 in f64 / a few ulp in f32 — the plasma kernel test convention.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import CavityConfig
from lbm_tpu.models import cavity


def _run(cfg, steps):
    s = cavity.init_state(cfg)
    step = jax.jit(cavity.make_step(cfg))
    for _ in range(steps):
        s = step(s)
    return s


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 1e-5, 1e-6),
    (jnp.float64, 1e-12, 1e-14),
])
@pytest.mark.parametrize("band", [8, 16, 32])
def test_fused_matches_jnp(dtype, rtol, atol, band):
    """Several steps across the lid ramp, every band height incl. the
    single-band (nk=1) case where bottom and top fixups share a band."""
    cfg = CavityConfig(NX=48, NY=32, nsteps=0, dtype=dtype)
    ref = _run(cfg, 25)

    cfgf = dataclasses.replace(cfg, backend="fused", kernel_interpret=True)
    s = cavity.init_state(cfgf)
    ulid = lambda st: cavity._lid_speed(cfgf, st.step)
    from lbm_tpu.kernels.fused_cavity import collide_stream_cavity
    for _ in range(25):
        f, rho, ux, uy = collide_stream_cavity(
            s.f, s.rho, s.ux, s.uy, ulid(s),
            tau=cfgf.tau, interpret=True, band=band)
        s = cavity.CavityState(f, rho, ux, uy, s.step + 1)

    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(s.rho), np.asarray(ref.rho),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(s.uy), np.asarray(ref.uy),
                               rtol=rtol, atol=atol)
    assert np.isfinite(np.asarray(s.f)).all()


def test_fused_backend_dispatch():
    """backend="fused" through make_step/make_rollout (auto band pick)."""
    cfg = CavityConfig(NX=40, NY=40, nsteps=60, dtype=jnp.float64)
    ref = _run(cfg, 60)
    cfgf = dataclasses.replace(cfg, backend="fused", kernel_interpret=True)
    s = jax.jit(cavity.make_rollout(cfgf))(cavity.init_state(cfgf))
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-12, atol=1e-15)
    # flow actually developed (the comparison is not vacuous)
    assert float(jnp.abs(s.ux).max()) > 1e-4


def test_fused_mass_conservation():
    cfg = CavityConfig(NX=32, NY=32, nsteps=100, dtype=jnp.float64,
                       backend="fused", kernel_interpret=True)
    s = cavity.init_state(cfg)
    m0 = float(s.f.sum())
    s = jax.jit(cavity.make_rollout(cfg))(s)
    assert abs(float(s.f.sum()) - m0) / m0 < 1e-12


def test_fused_rejects_indivisible_ny():
    from lbm_tpu.kernels.fused_cavity import collide_stream_cavity
    cfg = CavityConfig(NX=32, NY=33, dtype=jnp.float32)  # Ghia-style odd NY
    s = cavity.init_state(cfg)
    with pytest.raises(ValueError):
        collide_stream_cavity(s.f, s.rho, s.ux, s.uy, 0.1,
                              tau=cfg.tau, interpret=True)


def test_backend_validation():
    with pytest.raises(ValueError):
        CavityConfig(backend="cuda")
