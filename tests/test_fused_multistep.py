"""Temporally-blocked plasma kernel (NONE solver) vs the jnp path.

The multistep window's per-step math is the fused band kernel's (the
shared ops on whole-grid values); in f64 interpret mode with no storage
rounding the trajectories must match the jnp step to cross-program
fusion-ulp. The window-internal E dispatch (state field on step 1, zero
afterwards under the compat quirk) replicates models/plasma._solve_poisson
for PoissonSolver.NONE exactly."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, CompatFlags, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma


def _cfg(**kw):
    base = dict(NX=16, NY=16, nsteps=11, dtype=jnp.float64,
                poisson=PoissonSolver.NONE, bc=BC.PERIODIC)
    base.update(kw)
    return dataclasses.replace(PlasmaConfig(), **base)


def _ref_run(cfg, steps):
    rcfg = dataclasses.replace(cfg, backend="jnp", multistep=0)
    s = plasma.init_state(rcfg)
    return jax.jit(plasma.make_rollout(rcfg, steps))(s)


def _assert_states_close(a, b, rtol, atol):
    np.testing.assert_allclose(np.asarray(a.f), np.asarray(b.f),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(a.g), np.asarray(b.g),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(a.Ex), np.asarray(b.Ex),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("K", [1, 4, 16])
def test_multistep_matches_jnp_f64(K):
    """11 steps as K-step windows (+ remainder), compat quirk ON: the
    first step collides with the external field, the rest with zero."""
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=K)
    ref = _ref_run(cfg, 11)
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    assert int(s.step) == 11
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)
    # flow actually developed (electron drift under the step-0 field)
    assert float(jnp.abs(s.f - plasma.init_state(cfg).f).max()) > 0


def test_multistep_field_kept_without_quirk():
    """compat quirk OFF: the external field drives every step."""
    compat = CompatFlags(none_solver_kills_external_field=False)
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               compat=compat)
    ref = _ref_run(cfg, 11)
    assert float(jnp.abs(ref.Ex).max()) > 0  # field survived
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


def test_multistep_neutral_delta():
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=5,
               neutral_delta=True)
    ref = _ref_run(cfg, 11)
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


def test_multistep_bf16_window_rounding():
    """bf16 storage rounds once per window: the trajectory must track the
    f32-native jnp path (same delta layout — classic f32 neutrals diverge
    by design, STATUS drift table) within a few bf16 quanta per species
    scale."""
    cfg32 = _cfg(dtype=jnp.float32, nsteps=12, neutral_delta=True)
    ref = _ref_run(cfg32, 12)
    cfgm = dataclasses.replace(cfg32, backend="fused",
                               kernel_interpret=True, multistep=4,
                               storage="bf16")
    s = jax.jit(plasma.make_rollout(cfgm))(plasma.init_state(cfgm))
    assert s.f.dtype == jnp.bfloat16
    # g gets the loose gate: the thermal energy-loss term amplifies any
    # input rounding ~80x on small grids (the reference's near-singular
    # fragility, SURVEY 7.3.4) — same convention as test_bf16_storage's
    # 0.3-of-scale macro drift gates
    for name, tol in (("f", 3e-2), ("g", 0.3)):
        for sp in range(3):
            a = np.asarray(getattr(ref, name), np.float32)[sp]
            b = np.asarray(getattr(s, name), np.float32)[sp]
            scale = max(np.abs(a).max(), 1e-30)
            assert np.isfinite(b).all()
            assert np.abs(a - b).max() / scale < tol, (name, sp)


@pytest.mark.parametrize("K", [1, 4, 16])
def test_multistep_bounceback_matches_jnp_f64(K):
    """NONE + bounce-back (211 rows of the reference's own benchmark CSV):
    the in-kernel edge fixups (ops/stream.bounceback_fix_dirs) must
    replicate the jnp path's stream_bounceback incl. the corner-hole
    staleness quirks (pre-collision f for the f pass, post-collision f
    for the g pass)."""
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=K,
               bc=BC.BOUNCE_BACK)
    ref = _ref_run(cfg, 11)
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    assert int(s.step) == 11
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


def test_multistep_bounceback_neutral_delta():
    """Delta-stored neutrals under bounce-back: the g-pass corner holes
    leak CLASSIC post-collision f values, so the kernel must add the
    background rho_n_init * w_i back for species 2
    (models/plasma._g_holes_with_background)."""
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               bc=BC.BOUNCE_BACK, neutral_delta=True)
    ref = _ref_run(cfg, 11)
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


def test_multistep_fft_bounceback():
    """FFT under bounce-back is the reference's no-op solve
    (src/poisson.cpp:76-77 returns without solving) — E stays at the
    external value across the whole window, so the configuration is
    temporally blockable; every step collides with the state's E."""
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               poisson=PoissonSolver.FFT, bc=BC.BOUNCE_BACK)
    ref = _ref_run(cfg, 11)
    assert float(jnp.abs(ref.Ex).max()) > 0  # the no-op solve kept E
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


@pytest.mark.parametrize("K", [1, 4, 16])
def test_multistep_fft_periodic_matches_jnp_f64(K):
    """FFT + periodic — the reference's GOLDEN configuration
    (src/main_plasma.cpp:16-51) — temporally blocked with the spectral
    solve running IN-KERNEL as DFT matmuls each step. The matmul DFT is
    algebraically identical to the jnp path's rfft2 solve but rounds
    differently, so the gate is scale-relative (f64 interpret: the
    matmuls are exact f64, differences are DFT-vs-FFT roundoff)."""
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=K,
               poisson=PoissonSolver.FFT)
    ref = _ref_run(cfg, 11)
    assert float(jnp.abs(ref.phi).max()) > 0  # the solve actually ran
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    assert int(s.step) == 11
    for name in ("f", "g", "Ex", "Ey", "phi"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-11, name


def test_multistep_fft_periodic_neutral_delta():
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=5,
               poisson=PoissonSolver.FFT, neutral_delta=True)
    ref = _ref_run(cfg, 11)
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    for name in ("f", "g", "Ex", "phi"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-11, name


def test_multistep_fft_periodic_odd_nx():
    """The half-spectrum matrices handle odd NX (no Nyquist bin)."""
    cfg = _cfg(NX=15, backend="fused", kernel_interpret=True, multistep=4,
               poisson=PoissonSolver.FFT)
    ref = _ref_run(cfg, 7)
    s = jax.jit(plasma.make_rollout(cfg, 7))(plasma.init_state(cfg))
    for name in ("f", "Ex", "phi"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-11, name


@pytest.mark.parametrize("sol,bc", [
    ("GS", BC.PERIODIC), ("SOR", BC.BOUNCE_BACK), ("NPS", BC.PERIODIC)])
def test_multistep_iterative_matches_jnp_f64(sol, bc):
    """GS/SOR/NPS swept IN-KERNEL under a Mosaic while_loop (red-black /
    4-color masks from iotas, warm-started phi riding the window
    scratch) must replicate the per-step jnp dispatch: Dirichlet sweeps
    under periodic BCs (compat quirk), Neumann E closure under
    bounce-back, convergence on maxErr < tol with at least one sweep."""
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               poisson=PoissonSolver[sol], bc=bc, poisson_max_iter=60)
    ref = _ref_run(cfg, 11)
    assert float(jnp.abs(ref.phi).max()) > 0
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    assert int(s.step) == 11
    for name in ("f", "g", "Ex", "Ey", "phi"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-11, name


def test_multistep_iterative_periodic_sweeps_quirk_off():
    """With the dispatcher quirk off the sweeps run the true periodic
    masks (no interior restriction) — both paths must agree on that
    variant too."""
    compat = CompatFlags(dirichlet_iterative_under_periodic=False)
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               poisson=PoissonSolver.GS, compat=compat,
               poisson_max_iter=40)
    ref = _ref_run(cfg, 7)
    s = jax.jit(plasma.make_rollout(cfg, 7))(plasma.init_state(cfg))
    for name in ("f", "Ex", "phi"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-11, name


def test_multistep_config_validation():
    with pytest.raises(ValueError, match="multistep"):
        _cfg(multistep=4)  # jnp backend
    # every solver x BC combination is temporally blockable now: NONE
    # (either BC), FFT + bounce-back (no-op solve), FFT + periodic
    # (in-kernel spectral solve), GS/SOR/NPS (in-kernel sweeps)
    _cfg(backend="fused", multistep=4, bc=BC.BOUNCE_BACK)
    _cfg(backend="fused", multistep=4, bc=BC.BOUNCE_BACK,
         poisson=PoissonSolver.FFT)
    _cfg(backend="fused", multistep=4, poisson=PoissonSolver.FFT)
    _cfg(backend="fused", multistep=4, poisson=PoissonSolver.GS)
    _cfg(backend="fused", multistep=4, poisson=PoissonSolver.SOR,
         bc=BC.BOUNCE_BACK)
    # 3-D multistep is valid config ONLY for the NONE solver (the
    # multi-chip K-slab protocol needs a window-constant E)...
    cfg3 = _cfg(backend="fused", multistep=4, NZ=8)
    with pytest.raises(ValueError, match="NONE"):
        _cfg(backend="fused", multistep=4, NZ=8,
             poisson=PoissonSolver.FFT)
    # ...and the single-device 3-D model refuses it (sharded-only mode:
    # nothing to amortize on one chip)
    from lbm_tpu.models import plasma3d
    with pytest.raises(ValueError, match="multi-chip"):
        plasma3d.make_step(cfg3)


def test_multistep_unaligned_ny():
    """No NY % 8 gate: the kernel is whole-plane value ops, so Mosaic's
    tile padding handles unaligned grids — the reference's literal 100^2
    benchmark grid runs (semantics pinned here in f64 interpret; the
    Mosaic-padding behavior itself is verified on hardware, STATUS)."""
    cfg = _cfg(NX=16, NY=20, backend="fused", kernel_interpret=True,
               multistep=4)
    ref = _ref_run(cfg, 9)
    s = jax.jit(plasma.make_rollout(cfg, 9))(plasma.init_state(cfg))
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


def _mesh(n_dev):
    import numpy as np
    from jax.sharding import Mesh

    from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y
    devs = jax.devices("cpu")[:n_dev]
    return Mesh(np.asarray(devs).reshape(n_dev, 1), (AXIS_Y, AXIS_X))


@pytest.mark.parametrize("n_dev,kill,delta",
                         [(2, True, False), (4, False, True)])
def test_multistep_sharded_matches_jnp_f64(n_dev, kill, delta):
    """Multi-chip temporal blocking: K-deep ghost rows exchanged once per
    window, the unchanged multistep kernel on the extended shard, interior
    slice exact (the y-wrap corruption travels 1 row/step and never
    crosses the K-row ghost zone). Gates at f64 ulp vs the single-device
    jnp rollout, remainder window included (19 = 2*8 + 3)."""
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_multistep_rollout

    compat = (CompatFlags() if kill
              else CompatFlags(none_solver_kills_external_field=False))
    cfg = _cfg(NX=24, NY=64, nsteps=19, backend="fused",
               kernel_interpret=True, multistep=8, compat=compat,
               neutral_delta=delta)
    ref = _ref_run(cfg, 19)
    roll = make_fused_sharded_multistep_rollout(cfg, _mesh(n_dev), 19)
    s = roll(plasma.init_state(cfg))
    assert int(s.step) == 19
    for name in ("f", "g", "Ex"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-14, name


def test_multistep_sharded_bf16():
    """bf16 storage through the sharded window: halved ICI slab bytes,
    one rounding per window; tracks the f32-delta jnp path within the
    same per-species gates as the single-device bf16 window test."""
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_multistep_rollout

    cfg32 = _cfg(NX=24, NY=64, dtype=jnp.float32, nsteps=16,
                 neutral_delta=True)
    ref = _ref_run(cfg32, 16)
    cfgm = dataclasses.replace(cfg32, backend="fused",
                               kernel_interpret=True, multistep=8,
                               storage="bf16")
    roll = make_fused_sharded_multistep_rollout(cfgm, _mesh(2), 16)
    s = roll(plasma.init_state(cfgm))
    assert s.f.dtype == jnp.bfloat16
    for name, tol in (("f", 3e-2), ("g", 0.3)):
        for sp in range(3):
            a = np.asarray(getattr(ref, name), np.float32)[sp]
            b = np.asarray(getattr(s, name), np.float32)[sp]
            scale = max(np.abs(a).max(), 1e-30)
            assert np.isfinite(b).all()
            assert np.abs(a - b).max() / scale < tol, (name, sp)


def test_multistep_sharded_validation():
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_multistep_rollout

    with pytest.raises(ValueError, match="K % 8"):
        make_fused_sharded_multistep_rollout(
            _cfg(NY=64, backend="fused", kernel_interpret=True,
                 multistep=4), _mesh(2), 8)
    with pytest.raises(ValueError, match="NONE"):
        make_fused_sharded_multistep_rollout(
            _cfg(NY=64, backend="fused", kernel_interpret=True,
                 multistep=8, poisson=PoissonSolver.FFT), _mesh(2), 8)
    with pytest.raises(ValueError, match="divisible"):
        make_fused_sharded_multistep_rollout(
            _cfg(NY=24, backend="fused", kernel_interpret=True,
                 multistep=8), _mesh(2), 8)
    with pytest.raises(ValueError, match="one-hop"):
        # K deeper than a shard: the ghost slab can't come from one
        # ppermute (neighbor owns only rows < K)
        make_fused_sharded_multistep_rollout(
            _cfg(NY=64, backend="fused", kernel_interpret=True,
                 multistep=40), _mesh(2), 40)


def test_multistep_rejects_oversized_grid():
    from lbm_tpu.kernels.fused_multistep import (
        check_vmem_multistep_plasma, collide_stream_multistep)
    assert check_vmem_multistep_plasma(200, 200, 4)
    assert not check_vmem_multistep_plasma(512, 512, 4)
    f = jnp.zeros((3, 9, 512, 512), jnp.float32)
    E = jnp.zeros((512, 512), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        collide_stream_multistep(f, f, E, E, taus=(5, 3, 1, 6, 4, 2),
                                 q_e=-1.0, q_i=1.0, m_e=1.0, m_i=1836.0,
                                 cs2=1 / 3, kb=1.0, k_steps=2,
                                 interpret=True)

@pytest.mark.parametrize("delta", [False, True])
def test_multistep_banded_matches_jnp_f64(delta):
    """BANDED temporal blocking (NONE + periodic past the whole-state
    VMEM budget): K-deep ghost slabs sliced from the global arrays are
    the TRUE periodic neighbors for every band, so the windows must be
    bitwise the whole-grid multistep kernel's and track the per-step jnp
    path at f64-ulp (11 steps = 4+4+3 with the quirk's E zeroing
    between windows)."""
    from lbm_tpu.kernels.fused_multistep import (
        collide_stream_multistep, collide_stream_multistep_banded)

    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               neutral_delta=delta)
    ref = _ref_run(cfg, 11)
    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb,
              neutral_ref=u.rho_n_init if delta else 0.0,
              kill_field=True, interpret=True)
    st = plasma.init_state(cfg)
    f, g, Ex, Ey = st.f, st.g, st.Ex, st.Ey
    fw, gw = f, g
    for k in (4, 4, 3):
        f, g = collide_stream_multistep_banded(f, g, Ex, Ey, k_steps=k,
                                               bands=4, **kw)
        fw, gw = collide_stream_multistep(fw, gw, Ex, Ey, k_steps=k, **kw)
        Ex, Ey = jnp.zeros_like(Ex), jnp.zeros_like(Ey)
    assert float(jnp.max(jnp.abs(f - fw))) == 0.0  # bitwise vs whole-grid
    assert float(jnp.max(jnp.abs(g - gw))) == 0.0
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                               rtol=1e-11, atol=1e-22)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref.g),
                               rtol=1e-11, atol=1e-22)


def test_multistep_banded_rollout_dispatch(monkeypatch):
    """make_rollout auto-picks banded windows when the whole state fails
    the VMEM check (forced by a shrunk budget); in-kernel-SOLVER configs
    past the budget raise the documented error (the solvers are global —
    bounce-back configs instead route through the gated banded kernel,
    see test_multistep_banded_bounceback_rollout_dispatch)."""
    from lbm_tpu.kernels import fused_multistep as fm

    real = fm.check_vmem_multistep_plasma
    monkeypatch.setattr(
        fm, "check_vmem_multistep_plasma",
        lambda NY, NX, it, budget=0, solve=False: NY < 16)
    try:
        cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4)
        s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
        with pytest.raises(ValueError, match="window-constant E"):
            plasma.make_rollout(_cfg(backend="fused", kernel_interpret=True,
                                     multistep=4,
                                     poisson=PoissonSolver.FFT))
        with pytest.raises(ValueError, match="window-constant E"):
            plasma.make_rollout(_cfg(backend="fused", kernel_interpret=True,
                                     multistep=4, poisson=PoissonSolver.GS))
    finally:
        monkeypatch.setattr(fm, "check_vmem_multistep_plasma", real)
    ref = _ref_run(_cfg(), 11)
    assert int(s.step) == 11
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


def test_multistep_banded_validation():
    from lbm_tpu.kernels.fused_multistep import (
        collide_stream_multistep_banded, pick_multistep_bands_plasma)

    f = jnp.zeros((3, 9, 16, 16), jnp.float32)
    g = jnp.zeros_like(f)
    E = jnp.zeros((16, 16), jnp.float32)
    kw = dict(taus=(5., 3., 1., 6., 4., 2.), q_e=-1., q_i=1., m_e=1.,
              m_i=1836., cs2=1. / 3., kb=1., k_steps=8, interpret=True)
    with pytest.raises(ValueError, match="divide"):
        collide_stream_multistep_banded(f, g, E, E, bands=3, **kw)
    with pytest.raises(ValueError, match="band rows"):
        collide_stream_multistep_banded(f, g, E, E, bands=4, **kw)
    # K deeper than any feasible band height -> no split
    assert pick_multistep_bands_plasma(512, 512, 4, 512) is None
    assert pick_multistep_bands_plasma(512, 512, 4, 32) == 8


def test_vmem_check_bf16_calibration():
    """The bf16 VMEM estimate is calibrated against measured v5e compile
    failures: (48, 2048) and (24, 4096) extended bands both hit "scoped
    allocation 101.50MiB > 100.00MiB" (= 1083 B/site, well over the
    analytic 752 — Mosaic materializes f32 conversion copies of the bf16
    blocks). These pins keep the feasibility boundary exactly where the
    hardware put it."""
    from lbm_tpu.kernels.fused_multistep import (
        check_vmem_multistep_plasma, pick_multistep_bands_plasma)

    # the two measured OOM shapes must now be rejected
    assert not check_vmem_multistep_plasma(48, 2048, 2)
    assert not check_vmem_multistep_plasma(24, 4096, 2)
    # measured-good shapes stay admitted: (80, 1024) banded bf16 ran on
    # v5e (84.6 MB), (32, 2048) fits (67.7 MB), and the 304^2 whole-grid
    # bf16 point (96.1 MB incl. margin) keeps its documented capability
    assert check_vmem_multistep_plasma(80, 1024, 2)
    assert check_vmem_multistep_plasma(32, 2048, 2)
    assert check_vmem_multistep_plasma(304, 304, 2)
    # picker consequences at the BASELINE grids: 2048^2 bf16 K=8 lands on
    # R=16 (B=128, 2x redundancy); 4096^2 is infeasible in BOTH storages
    assert pick_multistep_bands_plasma(2048, 2048, 2, 8) == 128
    assert pick_multistep_bands_plasma(4096, 4096, 2, 8) is None
    assert pick_multistep_bands_plasma(4096, 4096, 4, 8) is None


@pytest.mark.parametrize("solver,bands", [
    (PoissonSolver.NONE, 2),   # K=4 < R=8
    (PoissonSolver.NONE, 4),   # K == R: ghost spans the whole neighbor band
    (PoissonSolver.FFT, 2),    # FFT+BB = the no-op solve, E kept
])
def test_multistep_banded_bounceback_matches_whole_grid(solver, bands):
    """Banded bounce-back windows (the GATED kernel with traced wall rows
    on the first/last band) must match the whole-grid bounce kernel at
    f64-ulp-of-scale and the per-step jnp path at 1e-11 — the gated wall
    overwrite blocks the boundary bands' garbage wrap-ghosts (same-row
    sources only), and interior bands follow the periodic trapezoid
    argument. NOT bitwise: gated and ungated are different programs, so
    XLA's fusion context flips last bits on the huge classic-neutral
    scale (the repo-wide cross-program convention; measured ~2e-15 of
    scale here)."""
    from lbm_tpu.kernels.fused_multistep import (
        collide_stream_multistep, collide_stream_multistep_banded)

    kill = solver == PoissonSolver.NONE
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               bc=BC.BOUNCE_BACK, poisson=solver)
    ref = _ref_run(cfg, 11)
    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb, neutral_ref=0.0,
              kill_field=kill, bounce=True, interpret=True)
    st = plasma.init_state(cfg)
    f, g, Ex, Ey = st.f, st.g, st.Ex, st.Ey
    fw, gw = f, g
    for k in (4, 4, 3):
        f, g = collide_stream_multistep_banded(f, g, Ex, Ey, k_steps=k,
                                               bands=bands, **kw)
        fw, gw = collide_stream_multistep(fw, gw, Ex, Ey, k_steps=k, **kw)
        if kill:
            Ex, Ey = jnp.zeros_like(Ex), jnp.zeros_like(Ey)
    for a, b in ((f, fw), (g, gw)):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-300)
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < 1e-13, rel  # f64-ulp-of-scale vs whole-grid
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                               rtol=1e-11, atol=1e-22)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref.g),
                               rtol=1e-11, atol=1e-22)


def test_multistep_banded_bounceback_neutral_delta():
    """Delta-stored neutrals through the gated banded path: the g-pass
    corner holes must get the species-2 background added back on the wall
    bands only."""
    from lbm_tpu.kernels.fused_multistep import \
        collide_stream_multistep_banded

    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               bc=BC.BOUNCE_BACK, neutral_delta=True)
    ref = _ref_run(cfg, 8)
    u = cfg.units()
    kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
              cs2=u.cs2, kb=u.kb, neutral_ref=u.rho_n_init,
              kill_field=True, bounce=True, interpret=True)
    st = plasma.init_state(cfg)
    f, g, Ex, Ey = st.f, st.g, st.Ex, st.Ey
    for k in (4, 4):
        f, g = collide_stream_multistep_banded(f, g, Ex, Ey, k_steps=k,
                                               bands=2, **kw)
        Ex, Ey = jnp.zeros_like(Ex), jnp.zeros_like(Ey)
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                               rtol=1e-11, atol=1e-22)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref.g),
                               rtol=1e-11, atol=1e-22)


def test_multistep_banded_bounceback_rollout_dispatch(monkeypatch):
    """make_rollout routes past-VMEM BOUNCE-BACK multistep configs through
    the gated banded kernel (NONE + BB and FFT + BB are window-constant-E;
    the in-kernel solver configs still raise — they are global)."""
    from lbm_tpu.kernels import fused_multistep as fm

    monkeypatch.setattr(
        fm, "check_vmem_multistep_plasma",
        lambda NY, NX, it, budget=0, solve=False: NY < 16)
    cfg = _cfg(backend="fused", kernel_interpret=True, multistep=4,
               bc=BC.BOUNCE_BACK)
    s = jax.jit(plasma.make_rollout(cfg))(plasma.init_state(cfg))
    monkeypatch.undo()
    ref = _ref_run(cfg, 11)
    assert int(s.step) == 11
    _assert_states_close(s, ref, rtol=1e-11, atol=1e-22)


@pytest.mark.parametrize("n_dev,solver,steps", [
    (2, PoissonSolver.NONE, 19),   # remainder window (19 = 2*8 + 3)
    (4, PoissonSolver.NONE, 16),
    (2, PoissonSolver.FFT, 19),    # FFT+BB: no-op solve, E constant
])
def test_multistep_sharded_bounceback_matches_jnp_f64(n_dev, solver, steps):
    """Multi-chip temporal blocking under BOUNCE-BACK walls: the gated
    kernel's traced wall rows land only on the first/last shard and block
    the ring ppermute's garbage wrap-ghosts; gates at f64 ulp vs the
    single-device jnp rollout, remainder window included."""
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_multistep_rollout

    cfg = _cfg(NX=24, NY=64, nsteps=steps, backend="fused",
               kernel_interpret=True, multistep=8, bc=BC.BOUNCE_BACK,
               poisson=solver)
    ref = _ref_run(cfg, steps)
    roll = make_fused_sharded_multistep_rollout(cfg, _mesh(n_dev), steps)
    s = roll(plasma.init_state(cfg))
    assert int(s.step) == steps
    if solver == PoissonSolver.FFT:
        assert float(jnp.abs(s.Ex).max()) > 0  # the no-op solve kept E
    # f64-ulp-of-scale, not bitwise: the gated kernel is a different
    # program from the jnp step, so fusion context flips last bits on the
    # classic-neutral scale (repo-wide cross-program convention)
    for name in ("f", "g", "Ex"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-13, name


def _mesh2d(ndy, ndx):
    import numpy as np
    from jax.sharding import Mesh

    from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y
    devs = jax.devices("cpu")[:ndy * ndx]
    return Mesh(np.asarray(devs).reshape(ndy, ndx), (AXIS_Y, AXIS_X))


@pytest.mark.parametrize("ndy,ndx,steps", [
    (2, 2, 19),   # remainder window (19 = 2*8 + 3)
    (2, 4, 16),
])
def test_multistep_sharded_2d_matches_jnp_f64(ndy, ndx, steps):
    """2-D (dy, dx) mesh temporal blocking: two-phase K-slab exchange
    (row slabs along dy, then column slabs of the EXTENDED arrays along
    dx, which carries the diagonal neighbors' K x K corner blocks), the
    unchanged kernel on the (rows+2K, cols+2K) extension, interior slice
    exact by the 2-D trapezoid argument. f64-ulp vs single-device jnp."""
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_multistep_rollout_2d

    cfg = _cfg(NX=8 * ndx, NY=16 * ndy, nsteps=steps, backend="fused",
               kernel_interpret=True, multistep=8)
    ref = _ref_run(cfg, steps)
    roll = make_fused_sharded_multistep_rollout_2d(
        cfg, _mesh2d(ndy, ndx), steps)
    s = roll(plasma.init_state(cfg))
    assert int(s.step) == steps
    for name in ("f", "g", "Ex"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-13, name


def test_multistep_sharded_2d_validation():
    from lbm_tpu.parallel.fused_sharded import \
        make_fused_sharded_multistep_rollout_2d

    m = _mesh2d(2, 2)
    with pytest.raises(ValueError, match="K % 8"):
        make_fused_sharded_multistep_rollout_2d(
            _cfg(NX=16, NY=32, backend="fused", kernel_interpret=True,
                 multistep=4), m, 8)
    with pytest.raises(ValueError, match="NONE \\+ periodic"):
        make_fused_sharded_multistep_rollout_2d(
            _cfg(NX=16, NY=32, backend="fused", kernel_interpret=True,
                 multistep=8, bc=BC.BOUNCE_BACK), m, 8)
    with pytest.raises(ValueError, match="divisible"):
        make_fused_sharded_multistep_rollout_2d(
            _cfg(NX=15, NY=32, backend="fused", kernel_interpret=True,
                 multistep=8), m, 8)
    with pytest.raises(ValueError, match="cols/shard"):
        # K deeper than a shard's columns: one-hop x-exchange impossible
        make_fused_sharded_multistep_rollout_2d(
            _cfg(NX=8, NY=32, backend="fused", kernel_interpret=True,
                 multistep=8), m, 8)
