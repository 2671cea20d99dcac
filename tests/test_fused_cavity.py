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


# ---------------------------------------------------------------------------
# Sharded (multi-chip) fused cavity: shard_map + ICI halo strips
# ---------------------------------------------------------------------------

def _mesh_1d(n):
    from jax.sharding import Mesh
    from lbm_tpu.parallel.mesh import AXIS_Y
    return Mesh(np.asarray(jax.devices()[:n]), (AXIS_Y,))


@pytest.mark.parametrize("ndev", [2, 4])
def test_sharded_fused_cavity_matches_single(ndev):
    """4-device CPU mesh vs the single-device jnp path across the lid
    ramp (f64, interpret kernels): every wall/lid fixup must land on the
    right shard."""
    from lbm_tpu.parallel import fused_sharded

    cfg = CavityConfig(NX=48, NY=64, nsteps=0, dtype=jnp.float64)
    ref = _run(cfg, 30)

    step_sh = fused_sharded.make_fused_sharded_cavity_step(
        cfg, _mesh_1d(ndev))
    s = cavity.init_state(cfg)
    for _ in range(30):
        s = step_sh(s)

    # abs gates: measured deltas are f64-ulp (<= 7e-16, the fusion-context
    # effect); the atol covers relative blow-up on ~1e-13 velocities
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-11, atol=1e-16)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-11, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s.uy), np.asarray(ref.uy),
                               rtol=1e-11, atol=1e-14)
    assert float(jnp.abs(s.ux).max()) > 1e-5  # developed flow


def test_sharded_fused_cavity_rejects_indivisible():
    from lbm_tpu.parallel import fused_sharded

    cfg = CavityConfig()  # the Ghia 129^2 default
    with pytest.raises(ValueError, match="divisible"):
        fused_sharded.make_fused_sharded_cavity_step(cfg, _mesh_1d(2))


# ---------------------------------------------------------------------------
# bf16 delta storage (f as bf16 deviations from w_i; macros f32)
# ---------------------------------------------------------------------------

def test_bf16_fused_matches_jnp():
    """Both paths do identical f32 math on identically-decoded state with
    ONE bf16 rounding at the store, so differences are fusion-context FMA
    noise optionally amplified to a single bf16 quantum of the delta."""
    cfg = CavityConfig(NX=48, NY=32, nsteps=0, storage="bf16")
    ref = _run(cfg, 25)

    cfgf = dataclasses.replace(cfg, backend="fused", kernel_interpret=True)
    s = jax.jit(cavity.make_rollout(cfgf, 25))(cavity.init_state(cfgf))

    assert s.f.dtype == jnp.bfloat16 and s.rho.dtype == jnp.float32
    ff = np.asarray(cavity.decode_f(cfg, s.f))
    fr = np.asarray(cavity.decode_f(cfg, ref.f))
    # one bf16 quantum (spacing <= 2^-7 |v|) of the max stored delta
    # bounds any rounding-decision flip
    q = float(np.abs(np.asarray(ref.f, np.float32)).max()) * 2 ** -7
    np.testing.assert_allclose(ff, fr, rtol=0, atol=max(q, 1e-6))
    # macros are f32 but derive from the quantized f: a one-quantum flip in
    # a few populations moves the momentum sum by a couple of quanta
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=0, atol=3 * q)
    assert np.isfinite(ff).all()


def test_bf16_mass_conservation_bound():
    """bf16 delta storage keeps the mass drift at the 1e-4 level over
    hundreds of steps (plain bf16 f drifts ~1e-2 over 10k — STATUS)."""
    cfg = CavityConfig(NX=32, NY=32, nsteps=400, storage="bf16")
    s = cavity.init_state(cfg)
    s = jax.jit(cavity.make_rollout(cfg))(s)
    m = float(jnp.sum(cavity.decode_f(cfg, s.f).astype(jnp.float32)))
    assert abs(m / (32 * 32) - 1.0) < 5e-4


def test_bf16_sharded_fused_cavity():
    """bf16 delta storage through the halo-strip sharded path (halved ICI
    halo bytes; the redundant halo collide decodes the same way)."""
    from lbm_tpu.parallel import fused_sharded

    cfg = CavityConfig(NX=48, NY=64, nsteps=0, storage="bf16")
    ref = _run(cfg, 20)
    step_sh = fused_sharded.make_fused_sharded_cavity_step(cfg, _mesh_1d(4))
    s = cavity.init_state(cfg)
    for _ in range(20):
        s = step_sh(s)
    ff = np.asarray(cavity.decode_f(cfg, s.f))
    fr = np.asarray(cavity.decode_f(cfg, ref.f))
    q = float(np.abs(np.asarray(fr, np.float32)).max()) * 2 ** -7
    np.testing.assert_allclose(ff, fr, rtol=0, atol=max(q, 1e-6))


def test_bf16_storage_validation():
    with pytest.raises(ValueError):
        CavityConfig(storage="fp8")
    with pytest.raises(ValueError):
        CavityConfig(storage="bf16", dtype=jnp.float64)


def test_fused_matches_jnp_random_state():
    """Random (finite, positive-rho) states stress fixup paths a smooth
    developed flow never exercises (garbage-row masking, corner winners
    with sign-mixed populations)."""
    rng = np.random.default_rng(7)
    NY, NX = 40, 56
    f = jnp.asarray(rng.uniform(0.01, 0.5, (9, NY, NX)), jnp.float64)
    rho, ux, uy = (jnp.asarray(a, jnp.float64) for a in (
        rng.uniform(0.5, 1.5, (NY, NX)),
        rng.uniform(-0.1, 0.1, (NY, NX)),
        rng.uniform(-0.1, 0.1, (NY, NX))))
    cfg = CavityConfig(NX=NX, NY=NY, nsteps=0, dtype=jnp.float64)
    s_j = cavity.CavityState(f, rho, ux, uy, jnp.asarray(20, jnp.int32))
    s_k = s_j
    step = jax.jit(cavity.make_step(cfg))
    from lbm_tpu.kernels.fused_cavity import collide_stream_cavity
    for _ in range(3):
        s_j = step(s_j)
        u = cavity._lid_speed(cfg, s_k.step)
        fk, rk, uk, vk = collide_stream_cavity(
            s_k.f, s_k.rho, s_k.ux, s_k.uy, u, tau=cfg.tau, interpret=True,
            band=8)
        s_k = cavity.CavityState(fk, rk, uk, vk, s_k.step + 1)
    np.testing.assert_allclose(np.asarray(s_k.f), np.asarray(s_j.f),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(s_k.ux), np.asarray(s_j.ux),
                               rtol=1e-12, atol=1e-13)


# ---------------------------------------------------------------------------
# Lean-macro mode: populations-only traffic, macros recomputed in-register
# ---------------------------------------------------------------------------

def test_lean_matches_stored_fused_f32():
    """In f32 the lean kernel computes the exact same mathematical
    function as the stored-macro kernel (the init state's analytic rho=1
    equals the sequential w-sum exactly, and thereafter stored macros ==
    macros_guarded(f) by the recurrence); trajectories agree to the usual
    fusion-context ulp (the macros are evaluated in a different program
    context, so FMA contraction flips last bits like every other
    cross-program comparison in this suite)."""
    cfg = CavityConfig(NX=48, NY=32, nsteps=40, dtype=jnp.float32,
                       backend="fused", kernel_interpret=True)
    ref = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    cfgl = dataclasses.replace(cfg, lean_macros=True)
    s = jax.jit(cavity.make_rollout(cfgl))(cavity.init_state(cfgl))
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-4, atol=1e-6)
    assert float(jnp.abs(s.ux).max()) > 1e-4


def test_lean_step_matches_rollout():
    """make_step's lean path (full state back per call) agrees with the
    reduced-carry rollout."""
    cfg = CavityConfig(NX=32, NY=32, nsteps=0, dtype=jnp.float32,
                       backend="fused", kernel_interpret=True,
                       lean_macros=True)
    s = cavity.init_state(cfg)
    step = jax.jit(cavity.make_step(cfg))
    for _ in range(15):
        s = step(s)
    r = jax.jit(cavity.make_rollout(cfg, 15))(cavity.init_state(cfg))
    assert np.array_equal(np.asarray(s.f), np.asarray(r.f))
    assert np.array_equal(np.asarray(s.rho), np.asarray(r.rho))


def test_lean_bf16_runs_with_documented_accuracy():
    """bf16+lean recomputes macros from the ROUNDED deltas (measured Ghia
    u 5.5% vs 2.5% for stored-f32 macros — a documented trade); here just
    pin that the mode runs, conserves mass, and tracks the stored-macro
    path at the bf16-quantum scale over a short window."""
    cfg = CavityConfig(NX=32, NY=32, nsteps=60, storage="bf16",
                       backend="fused", kernel_interpret=True)
    ref = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    cfgl = dataclasses.replace(cfg, lean_macros=True)
    s = jax.jit(cavity.make_rollout(cfgl))(cavity.init_state(cfgl))
    assert s.f.dtype == jnp.bfloat16
    ff = np.asarray(cavity.decode_f(cfgl, s.f))
    fr = np.asarray(cavity.decode_f(cfg, ref.f))
    assert np.isfinite(ff).all()
    m = float(np.asarray(ff, np.float64).sum())
    assert abs(m / (32 * 32) - 1.0) < 5e-4
    np.testing.assert_allclose(ff, fr, rtol=0, atol=3e-3)


def test_lean_requires_fused_backend():
    with pytest.raises(ValueError, match="lean"):
        CavityConfig(lean_macros=True)  # jnp backend default


# ---------------------------------------------------------------------------
# Multi-step (temporally-blocked) kernel: K whole steps per launch,
# grid VMEM-resident
# ---------------------------------------------------------------------------

def test_multistep_matches_jnp_f64():
    """23 steps as 4 windows of 5 + a remainder of 3, crossing the lid
    ramp (sigma=10): the in-kernel ramp evaluation and the window
    chaining must reproduce the per-step jnp trajectory exactly (f64
    interpret, no storage rounding anywhere)."""
    cfg = CavityConfig(NX=48, NY=32, nsteps=23, dtype=jnp.float64)
    ref = _run(cfg, 23)
    cfgm = dataclasses.replace(cfg, backend="fused", kernel_interpret=True,
                               multistep=5)
    s = jax.jit(cavity.make_rollout(cfgm))(cavity.init_state(cfgm))
    assert int(s.step) == 23
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-12, atol=1e-14)
    assert float(jnp.abs(s.ux).max()) > 1e-4  # developed flow


def test_multistep_unaligned_ny():
    """No NY % 8 gate on the multistep kernel (whole-plane value ops;
    Mosaic pads tiles) — the literal Ghia 129^2 grid runs through it.
    Semantics pinned at an odd NY in f64 interpret; measured on v5e:
    129^2 x 10k in ~40 ms with Ghia u 2.56% / v 0.89% (STATUS)."""
    cfg = CavityConfig(NX=48, NY=33, nsteps=11, dtype=jnp.float64)
    ref = _run(cfg, 11)
    cfgm = dataclasses.replace(cfg, backend="fused", kernel_interpret=True,
                               multistep=4)
    s = jax.jit(cavity.make_rollout(cfgm))(cavity.init_state(cfgm))
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-12, atol=1e-15)


def test_multistep_f32_tracks_lean():
    cfg = CavityConfig(NX=32, NY=32, nsteps=40, dtype=jnp.float32,
                       backend="fused", kernel_interpret=True,
                       lean_macros=True)
    ref = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    cfgm = dataclasses.replace(cfg, lean_macros=False, multistep=8)
    s = jax.jit(cavity.make_rollout(cfgm))(cavity.init_state(cfgm))
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-4, atol=1e-6)


def test_multistep_bf16_window_rounding():
    """bf16 multistep rounds once per WINDOW (strictly fewer roundings
    than the per-step bf16 kernel): the trajectory must track the f32
    path at the bf16-quantum scale and conserve mass."""
    cfg32 = CavityConfig(NX=32, NY=32, nsteps=60, dtype=jnp.float32)
    ref = _run(cfg32, 60)
    cfgm = dataclasses.replace(cfg32, storage="bf16", backend="fused",
                               kernel_interpret=True, multistep=10)
    s = jax.jit(cavity.make_rollout(cfgm))(cavity.init_state(cfgm))
    assert s.f.dtype == jnp.bfloat16
    ff = np.asarray(cavity.decode_f(cfgm, s.f))
    q = float(np.abs(np.asarray(ref.f, np.float32)).max()) * 2 ** -7
    np.testing.assert_allclose(ff, np.asarray(ref.f), rtol=0,
                               atol=max(3 * q, 1e-6))
    m = float(np.asarray(ff, np.float64).sum())
    assert abs(m / (32 * 32) - 1.0) < 5e-4


def test_multistep_step_dispatch():
    """make_step under a multistep cfg runs k=1 windows (same per-step
    math); the step counter and macros must line up with the rollout's
    materialization in f64 (no storage rounding: trajectories equal)."""
    cfg = CavityConfig(NX=32, NY=32, nsteps=0, dtype=jnp.float64,
                       backend="fused", kernel_interpret=True, multistep=4)
    s = cavity.init_state(cfg)
    step = jax.jit(cavity.make_step(cfg))
    for _ in range(12):
        s = step(s)
    r = jax.jit(cavity.make_rollout(cfg, 12))(cavity.init_state(cfg))
    assert int(s.step) == int(r.step) == 12
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(r.f),
                               rtol=1e-12, atol=1e-15)


def test_multistep_rejects_oversized_grid():
    from lbm_tpu.kernels.fused_cavity import (check_vmem_multistep,
                                              collide_stream_cavity_multistep)
    assert not check_vmem_multistep(768, 768, 4)
    assert check_vmem_multistep(256, 256, 4)
    f = jnp.zeros((9, 768, 768), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        collide_stream_cavity_multistep(f, 0, tau=0.6, k_steps=4,
                                        u_lid=0.1, sigma=10.0,
                                        interpret=True)


def test_multistep_config_validation():
    with pytest.raises(ValueError, match="multistep"):
        CavityConfig(multistep=8)  # jnp backend
    with pytest.raises(ValueError, match="multistep"):
        CavityConfig(multistep=-1, backend="fused")


@pytest.mark.parametrize("ndev", [2, 4])
def test_lean_sharded_matches_single(ndev):
    """Populations-only halo protocol (9-plane ICI strips) vs the
    single-device jnp path across the lid ramp — the halo strips' macros
    are recomputed in-register exactly like the owning shard's own, so the
    gates match the stored-macro sharded test's f64-ulp level."""
    from lbm_tpu.parallel import fused_sharded

    cfg = CavityConfig(NX=48, NY=64, nsteps=0, dtype=jnp.float64)
    ref = _run(cfg, 30)

    cfgl = dataclasses.replace(cfg, backend="fused", lean_macros=True)
    step_sh = fused_sharded.make_fused_sharded_cavity_step(
        cfgl, _mesh_1d(ndev))
    s = cavity.init_state(cfgl)
    for _ in range(30):
        s = step_sh(s)

    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-11, atol=1e-16)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-11, atol=1e-14)
    assert float(jnp.abs(s.ux).max()) > 1e-5  # developed flow


def test_lean_sharded_rollout_matches_step():
    """The reduced-carry sharded rollout equals per-step marching (the
    scan carry drops the redundant macros; the final materialization must
    land on the same state)."""
    from lbm_tpu.parallel import fused_sharded

    cfg = CavityConfig(NX=32, NY=32, nsteps=0, dtype=jnp.float32,
                       backend="fused", lean_macros=True)
    mesh = _mesh_1d(2)
    step_sh = fused_sharded.make_fused_sharded_cavity_step(cfg, mesh)
    s = cavity.init_state(cfg)
    for _ in range(12):
        s = step_sh(s)
    roll = fused_sharded.make_fused_sharded_cavity_rollout(cfg, mesh, 12)
    r = roll(cavity.init_state(cfg))
    assert np.array_equal(np.asarray(s.f), np.asarray(r.f))
    assert np.array_equal(np.asarray(s.rho), np.asarray(r.rho))
    assert int(r.step) == 12


def test_lean_sharded_bf16():
    """bf16 delta storage through the lean halo path (36 B/site on-shard,
    halved-again ICI strips); tracked against the single-device lean
    kernel at the bf16-quantum scale."""
    from lbm_tpu.parallel import fused_sharded

    cfg = CavityConfig(NX=48, NY=64, nsteps=20, storage="bf16",
                       backend="fused", kernel_interpret=True,
                       lean_macros=True)
    ref = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    roll = fused_sharded.make_fused_sharded_cavity_rollout(
        cfg, _mesh_1d(4), 20)
    s = roll(cavity.init_state(cfg))
    assert s.f.dtype == jnp.bfloat16
    ff = np.asarray(cavity.decode_f(cfg, s.f))
    fr = np.asarray(cavity.decode_f(cfg, ref.f))
    q = float(np.abs(np.asarray(fr, np.float32)).max()) * 2 ** -7
    np.testing.assert_allclose(ff, fr, rtol=0, atol=max(q, 1e-6))


def _mesh_ms(n_dev):
    from jax.sharding import Mesh

    from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y
    devs = jax.devices("cpu")[:n_dev]
    return Mesh(np.asarray(devs).reshape(n_dev, 1), (AXIS_Y, AXIS_X))


@pytest.mark.parametrize("n_dev,steps,K", [(2, 23, 5), (4, 16, 8)])
def test_multistep_sharded_matches_jnp_f64(n_dev, steps, K):
    """Multi-chip cavity temporal blocking: K-deep ghost-row slabs once
    per window + the GATED multistep kernel (traced bottom/lid rows apply
    the global walls only on the shards holding them; the same-row wall
    overwrite blocks the boundary shards' garbage ghosts). f64-ulp vs the
    single-device jnp rollout across the lid ramp, remainder windows
    included (23 = 4*5 + 3)."""
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_cavity_multistep_rollout

    cfgj = CavityConfig(NX=48, NY=32, nsteps=steps, dtype=jnp.float64)
    ref = _run(cfgj, steps)
    cfgm = dataclasses.replace(cfgj, backend="fused",
                               kernel_interpret=True, multistep=K)
    roll = make_fused_sharded_cavity_multistep_rollout(
        cfgm, _mesh_ms(n_dev), steps)
    s = roll(cavity.init_state(cfgm))
    assert int(s.step) == steps
    assert float(jnp.abs(s.ux).max()) > 1e-4  # developed flow
    for name in ("f", "rho", "ux", "uy"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-13, name


def test_multistep_sharded_cavity_validation():
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_cavity_multistep_rollout

    with pytest.raises(ValueError, match="multistep"):
        make_fused_sharded_cavity_multistep_rollout(
            CavityConfig(NX=32, NY=32, dtype=jnp.float64), _mesh_ms(2), 8)
    with pytest.raises(ValueError, match="divisible"):
        make_fused_sharded_cavity_multistep_rollout(
            dataclasses.replace(CavityConfig(NX=32, NY=33,
                                             dtype=jnp.float64),
                                backend="fused", kernel_interpret=True,
                                multistep=8), _mesh_ms(2), 8)
    with pytest.raises(ValueError, match="one-hop"):
        # K deeper than a shard needs multi-hop ghosts — rejected
        make_fused_sharded_cavity_multistep_rollout(
            dataclasses.replace(CavityConfig(NX=32, NY=32,
                                             dtype=jnp.float64),
                                backend="fused", kernel_interpret=True,
                                multistep=24), _mesh_ms(2), 24)

def test_multistep_banded_matches_jnp_f64():
    """BANDED temporal blocking (grids past the whole-grid VMEM budget):
    K-deep-ghost row bands through the GATED kernel, ghost slabs sliced
    from the global array. 23 steps as 5-step windows + remainder across
    the lid ramp must reproduce the per-step jnp trajectory at f64-ulp,
    and be BITWISE equal to the whole-grid multistep kernel."""
    from lbm_tpu.kernels.fused_cavity import (
        collide_stream_cavity_multistep, collide_stream_cavity_multistep_banded)

    cfg = CavityConfig(NX=48, NY=32, nsteps=23, dtype=jnp.float64)
    ref = _run(cfg, 23)

    f = cavity.init_state(cfg).f
    fw = f
    t = jnp.asarray(0)
    for k in (5, 5, 5, 5, 3):
        f = collide_stream_cavity_multistep_banded(
            f, t, tau=cfg.tau, k_steps=k, u_lid=cfg.u_lid,
            sigma=cfg.sigma, bands=4, interpret=True)
        fw = collide_stream_cavity_multistep(
            fw, t, tau=cfg.tau, k_steps=k, u_lid=cfg.u_lid,
            sigma=cfg.sigma, interpret=True)
        t = t + k
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                               rtol=1e-12, atol=1e-15)
    assert float(jnp.max(jnp.abs(f - fw))) == 0.0  # bitwise vs whole-grid


def test_multistep_banded_rollout_dispatch(monkeypatch):
    """make_rollout auto-picks the banded variant when the whole grid
    fails the VMEM check (forced here by shrinking the budget so only
    sub-32-row extents pass)."""
    from lbm_tpu.kernels import fused_cavity as fc

    real = fc.check_vmem_multistep
    monkeypatch.setattr(fc, "check_vmem_multistep",
                        lambda NY, NX, it, budget=0: NY < 32)
    try:
        cfg = CavityConfig(NX=48, NY=32, nsteps=23, dtype=jnp.float64,
                           backend="fused", kernel_interpret=True,
                           multistep=5)
        s = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    finally:
        monkeypatch.setattr(fc, "check_vmem_multistep", real)
    ref = _run(CavityConfig(NX=48, NY=32, nsteps=0, dtype=jnp.float64), 23)
    assert int(s.step) == 23
    np.testing.assert_allclose(np.asarray(s.f), np.asarray(ref.f),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(s.ux), np.asarray(ref.ux),
                               rtol=1e-12, atol=1e-14)


def test_multistep_banded_validation():
    from lbm_tpu.kernels.fused_cavity import (
        collide_stream_cavity_multistep_banded, pick_multistep_bands)

    f = jnp.zeros((9, 32, 32), jnp.float32)
    kw = dict(tau=0.6, u_lid=0.1, sigma=10.0, interpret=True)
    with pytest.raises(ValueError, match="divide"):
        collide_stream_cavity_multistep_banded(f, 0, k_steps=4, bands=3,
                                               **kw)
    with pytest.raises(ValueError, match="band rows"):
        collide_stream_cavity_multistep_banded(f, 0, k_steps=9, bands=4,
                                               **kw)
    # pick: smallest feasible band count; None when K too deep
    assert pick_multistep_bands(2048, 2048, 4, 16) == 16
    assert pick_multistep_bands(2048, 2048, 4, 4096) is None


def test_multistep_banded_k_equals_rows():
    """K == R (ghost slabs span the whole neighbor band): the global wall
    rows land exactly on the extension edges, where the corruption-cone
    argument already covers them — must stay exact."""
    from lbm_tpu.kernels.fused_cavity import (
        collide_stream_cavity_multistep_banded)

    cfg = CavityConfig(NX=24, NY=16, nsteps=0, dtype=jnp.float64)
    ref = _run(cfg, 16)
    f = cavity.init_state(cfg).f
    t = jnp.asarray(0)
    for k in (8, 8):
        f = collide_stream_cavity_multistep_banded(
            f, t, tau=cfg.tau, k_steps=k, u_lid=cfg.u_lid,
            sigma=cfg.sigma, bands=2, interpret=True)
        t = t + k
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                               rtol=1e-12, atol=1e-15)
