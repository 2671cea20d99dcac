"""3-D neutral delta storage and bf16 population storage.

The D3Q19 analogs of tests/test_neutral_delta.py and
tests/test_bf16_storage.py: the delta layout must track the classic
layout to rounding in f64 and rescue the f32 neutral channel; the bf16
mode must halve the stored bytes while the fused kernel reproduces the
jnp semantics (f bitwise; g within the approx-reciprocal fast-thermal
tolerance — the DDF coupling is one-way in 3-D too).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma3d


def _cfg(**kw):
    base = dict(NX=12, NY=16, NZ=8, nsteps=3, dtype=jnp.float64,
                poisson=PoissonSolver.FFT)
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def _run(cfg, steps):
    s = plasma3d.init_state(cfg)
    step = jax.jit(plasma3d.make_step(cfg))
    for _ in range(steps):
        s = step(s)
    u = cfg.units()
    mac = plasma3d.update_macro(
        s.f.astype(cfg.dtype), s.g.astype(cfg.dtype), s.Ex, s.Ey, s.Ez,
        q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
        neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)
    return mac, s


def test_delta_matches_classic_f64():
    m0, _ = _run(_cfg(neutral_delta=False), 5)
    m1, _ = _run(_cfg(neutral_delta=True), 5)
    for name in ("rho", "ux", "uy", "uz", "T"):
        a = np.asarray(getattr(m0, name), np.float64)
        b = np.asarray(getattr(m1, name), np.float64)
        for s in range(3):
            scale = np.abs(a[s]).max()
            tol = 1e-6 if s == 2 else 1e-11
            # + atol floor: uz[e/i] is zero up to f64 noise (no z forcing,
            # z-uniform column), so a relative bound is meaningless there
            assert np.abs(a[s] - b[s]).max() <= tol * scale + 1e-15, (
                f"{name}[{s}]: {np.abs(a[s]-b[s]).max()} > {tol}*{scale}")


def test_delta_rescues_neutral_channel_f32():
    truth, _ = _run(_cfg(neutral_delta=True), 20)
    classic, _ = _run(_cfg(dtype=jnp.float32, neutral_delta=False), 20)
    delta, _ = _run(_cfg(dtype=jnp.float32, neutral_delta=True), 20)
    for name in ("ux", "uy", "T"):
        t = np.asarray(getattr(truth, name), np.float64)[2]
        scale = np.abs(t).max()
        e_c = np.abs(np.asarray(getattr(classic, name), np.float64)[2]
                     - t).max()
        e_d = np.abs(np.asarray(getattr(delta, name), np.float64)[2]
                     - t).max()
        assert e_d <= 1e-2 * scale, f"neutral {name}: {e_d/scale:.3e}"
        assert e_d < 0.1 * e_c, f"neutral {name}: {e_d:.3e} !<< {e_c:.3e}"


def test_fused_kernel_matches_jnp_delta_f64():
    """Kernel (interpret) bitwise == jnp in 3-D delta mode, f64."""
    cfg_k = _cfg(neutral_delta=True, backend="fused", kernel_interpret=True)
    cfg_j = _cfg(neutral_delta=True)
    s_k = plasma3d.init_state(cfg_k)
    s_j = plasma3d.init_state(cfg_j)
    step_k = jax.jit(plasma3d.make_step(cfg_k))
    step_j = jax.jit(plasma3d.make_step(cfg_j))
    for t in range(2):
        s_k = step_k(s_k)
        s_j = step_j(s_j)
        np.testing.assert_allclose(np.asarray(s_k.f), np.asarray(s_j.f),
                                   rtol=1e-12, atol=1e-18,
                                   err_msg=f"f step {t}")
        np.testing.assert_allclose(np.asarray(s_k.g), np.asarray(s_j.g),
                                   rtol=1e-12, atol=0, err_msg=f"g step {t}")


def test_bf16_fused_kernel_matches_jnp():
    """bf16 storage, 3-D: f/E/phi bitwise kernel-vs-jnp; g within the
    approx-reciprocal tolerance."""
    cfg_j = _cfg(dtype=jnp.float32, neutral_delta=True, storage="bf16")
    cfg_k = dataclasses.replace(cfg_j, backend="fused", kernel_interpret=True)
    s_j = plasma3d.init_state(cfg_j)
    s_k = plasma3d.init_state(cfg_k)
    assert s_j.f.dtype == jnp.bfloat16 and s_k.f.dtype == jnp.bfloat16
    step_j = jax.jit(plasma3d.make_step(cfg_j))
    step_k = jax.jit(plasma3d.make_step(cfg_k))
    for t in range(2):
        s_j = step_j(s_j)
        s_k = step_k(s_k)
        for name in ("f", "Ex", "Ey", "Ez", "phi"):
            a = np.asarray(getattr(s_j, name), dtype=np.float64)
            b = np.asarray(getattr(s_k, name), dtype=np.float64)
            assert np.array_equal(a, b), (
                f"{name} step {t}: max|d|={np.abs(a - b).max()}")
        a = np.asarray(s_j.g, dtype=np.float64)
        b = np.asarray(s_k.g, dtype=np.float64)
        for s in range(3):
            scale = np.abs(a[s]).max()
            assert np.abs(a[s] - b[s]).max() <= 2e-2 * scale, (
                f"g[{s}] step {t}")


def test_bf16_drift_vs_native_f32_bounded():
    """rho/u channels stay at the few-percent level; T is asserted only
    stable-and-finite. The thermal energy-loss term's conditioning on
    this config amplifies ANY input rounding ~80x into T_i (measured:
    native f32 itself drifts 1.2e-2 of scale there vs ~1e-6 in every
    other channel, and bf16-with-EXACT-thermal drifts identically to
    bf16-with-fast-thermal) — the reference's own near-singular
    fragility (SURVEY.md section 7.3.4), not a storage-mode defect."""
    cfg32 = _cfg(dtype=jnp.float32, neutral_delta=True)
    cfgb = dataclasses.replace(cfg32, storage="bf16")
    m32, s32 = _run(cfg32, 10)
    mb, sb = _run(cfgb, 10)
    assert np.isfinite(np.asarray(sb.f, np.float64)).all()
    for name, tol in (("rho", 5e-2), ("ux", 0.3), ("uy", 0.3)):
        a = np.asarray(getattr(m32, name), np.float64)
        b = np.asarray(getattr(mb, name), np.float64)
        for s in range(3):
            scale = np.abs(a[s]).max()
            assert np.abs(a[s] - b[s]).max() <= tol * scale, (
                f"{name}[{s}]: {np.abs(a[s]-b[s]).max()/scale:.2e}")
    a = np.asarray(m32.T, np.float64)
    b = np.asarray(mb.T, np.float64)
    for s in range(3):
        scale = np.abs(a[s]).max()
        assert np.isfinite(b[s]).all()
        assert np.abs(a[s] - b[s]).max() <= 2.0 * scale, f"T[{s}] blew up"


def test_sharded_3d_delta_matches_single():
    """z-sharded fused step in delta mode == single-device jnp (f64)."""
    from jax.sharding import Mesh
    from lbm_tpu.parallel import fused_sharded

    cfg = _cfg(NX=16, NY=16, NZ=8, neutral_delta=True)
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, (fused_sharded.AXIS_Z,))
    step_sh = fused_sharded.make_fused_sharded_step3d(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(cfg))
    s_sh = plasma3d.init_state(cfg)
    s_ref = plasma3d.init_state(cfg)
    for _ in range(2):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    np.testing.assert_allclose(np.asarray(s_sh.f), np.asarray(s_ref.f),
                               rtol=1e-11, atol=1e-20)
    np.testing.assert_allclose(np.asarray(s_sh.g), np.asarray(s_ref.g),
                               rtol=1e-11, atol=0)
