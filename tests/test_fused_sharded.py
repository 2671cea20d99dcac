"""Sharded fused step (shard_map + halo exchange) vs single-device jnp path.

Runs on the 8 virtual CPU devices from conftest with the kernel in
interpret mode.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma
from lbm_tpu.parallel import fused_sharded
from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y
from jax.sharding import Mesh


def _mesh_1d(n):
    import numpy as _np
    devs = _np.asarray(jax.devices()[:n]).reshape(n, 1)
    return Mesh(devs, (AXIS_Y, AXIS_X))


@pytest.mark.parametrize("solver", [PoissonSolver.FFT, PoissonSolver.NONE])
def test_sharded_fused_matches_single(solver):
    cfg = dataclasses.replace(PlasmaConfig(), NX=32, NY=64,
                              dtype=jnp.float64, poisson=solver)
    mesh = _mesh_1d(4)

    s_ref = plasma.init_state(cfg)
    step_ref = jax.jit(plasma.make_step(cfg))

    step_sh = fused_sharded.make_fused_sharded_step(cfg, mesh)
    # init on the default device; jit reshards on entry per in_shardings
    s_sh = plasma.init_state(cfg)

    for _ in range(3):
        s_ref = step_ref(s_ref)
        s_sh = step_sh(s_sh)

    np.testing.assert_allclose(np.asarray(s_sh.f), np.asarray(s_ref.f),
                               rtol=1e-11, atol=0)
    np.testing.assert_allclose(np.asarray(s_sh.g), np.asarray(s_ref.g),
                               rtol=1e-11, atol=0)
    np.testing.assert_allclose(np.asarray(s_sh.Ex), np.asarray(s_ref.Ex),
                               rtol=1e-9, atol=1e-16)


def test_sharded_fused_rejects_bad_mesh():
    cfg = dataclasses.replace(PlasmaConfig(), NX=32, NY=64)
    import numpy as _np
    devs = _np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh2d = Mesh(devs, (AXIS_Y, AXIS_X))
    with pytest.raises(ValueError):
        fused_sharded.make_fused_sharded_step(cfg, mesh2d)


def test_sharded_fused_validates_divisibility():
    cfg = dataclasses.replace(PlasmaConfig(), NX=32, NY=40)
    with pytest.raises(ValueError):
        fused_sharded.make_fused_sharded_step(cfg, _mesh_1d(4))


def test_sharded_fused_rejects_bounceback():
    """The shard_map halo protocol is periodic-only; bounce-back must be
    refused (GSPMD handles it), not silently run as periodic."""
    from lbm_tpu.config import BC
    cfg = dataclasses.replace(PlasmaConfig(), NX=32, NY=64,
                              bc=BC.BOUNCE_BACK)
    with pytest.raises(ValueError, match="periodic"):
        fused_sharded.make_fused_sharded_step(cfg, _mesh_1d(4))


def test_sharded_fused_3d_matches_single():
    """z-sharded shard_map + halo-slice 3-D fused kernel + transpose-
    scheduled distributed FFT == single-device jnp step, bitwise."""
    from lbm_tpu.models import plasma3d

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=16, NZ=8, nsteps=2,
                              dtype=jnp.float64, poisson=PoissonSolver.FFT)
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, (fused_sharded.AXIS_Z,))
    step_sh = fused_sharded.make_fused_sharded_step3d(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(
        dataclasses.replace(cfg, backend="jnp")))
    s_sh = plasma3d.init_state(cfg)
    s_ref = plasma3d.init_state(cfg)
    for _ in range(2):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    assert len(s_sh.f.sharding.device_set) == 4
    np.testing.assert_array_equal(np.asarray(s_sh.f), np.asarray(s_ref.f))
    np.testing.assert_array_equal(np.asarray(s_sh.g), np.asarray(s_ref.g))
    np.testing.assert_array_equal(np.asarray(s_sh.Ex), np.asarray(s_ref.Ex))


def test_sharded_fused_3d_y_matches_single():
    """y-sharded shard_map (shards = panels, 1-row ICI halo protocol) +
    paneled 3-D fused kernel == single-device jnp step. Not bitwise: the
    slab-decomposed solve transforms x, z, y (2 reshards) while the
    single-device chain runs x, y, z — exact algebra, last-bit rounding."""
    from lbm_tpu.models import plasma3d
    from lbm_tpu.parallel.mesh import AXIS_Y as _AY

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=64, NZ=8, nsteps=2,
                              dtype=jnp.float64, poisson=PoissonSolver.FFT)
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, (_AY,))
    step_sh = fused_sharded.make_fused_sharded_step3d_y(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(
        dataclasses.replace(cfg, backend="jnp")))
    s_sh = plasma3d.init_state(cfg)
    s_ref = plasma3d.init_state(cfg)
    for _ in range(2):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    assert len(s_sh.f.sharding.device_set) == 4
    for name in ("f", "g", "Ex", "Ey", "Ez", "phi"):
        a, b = np.asarray(getattr(s_sh, name)), np.asarray(getattr(s_ref, name))
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-11 * max(scale, 1.0),
                                   err_msg=name)


def test_sharded_fused_3d_y_rejects_infeasible():
    """A per-shard cross-section no panel height fits must raise at build
    time, and a non-divisible NY must raise."""
    from lbm_tpu.parallel.mesh import AXIS_Y as _AY

    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, (_AY,))
    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=60, NZ=8)
    with pytest.raises(ValueError):
        fused_sharded.make_fused_sharded_step3d_y(cfg, mesh)


def test_sharded_fused_3d_yz_matches_single():
    """(dz, dy) 2-D mesh: z-slice halos + y-row halos + two-hop corner
    rows + the z-halo panel kernel == single-device jnp step. Same
    last-bit FFT-reordering tolerance as the 1-D paths (the 2-D-sharded
    solve transforms x, y, z with different reshard points)."""
    from lbm_tpu.models import plasma3d
    from lbm_tpu.parallel.fused_sharded import AXIS_Z as _AZ
    from lbm_tpu.parallel.mesh import AXIS_Y as _AY

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=32, NZ=6, nsteps=2,
                              dtype=jnp.float64, poisson=PoissonSolver.FFT)
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, (_AZ, _AY))
    step_sh = fused_sharded.make_fused_sharded_step3d_yz(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(
        dataclasses.replace(cfg, backend="jnp")))
    s_sh = plasma3d.init_state(cfg)
    s_ref = plasma3d.init_state(cfg)
    for _ in range(2):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    assert len(s_sh.f.sharding.device_set) == 4
    for name in ("f", "g", "Ex", "Ey", "Ez", "phi"):
        a, b = np.asarray(getattr(s_sh, name)), np.asarray(getattr(s_ref, name))
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-11 * max(scale, 1.0),
                                   err_msg=name)


def test_sharded_fused_3d_yz_degenerate_axes():
    """dz=1 (and dy=1) mesh extents reduce to the shard's own periodic
    wrap — the composed path must still match the jnp step."""
    from lbm_tpu.models import plasma3d
    from lbm_tpu.parallel.fused_sharded import AXIS_Z as _AZ
    from lbm_tpu.parallel.mesh import AXIS_Y as _AY

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=32, NZ=4, nsteps=1,
                              dtype=jnp.float64, poisson=PoissonSolver.NONE)
    devs = np.asarray(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devs, (_AZ, _AY))
    step_sh = fused_sharded.make_fused_sharded_step3d_yz(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(
        dataclasses.replace(cfg, backend="jnp")))
    s_sh = step_sh(plasma3d.init_state(cfg))
    s_ref = step_ref(plasma3d.init_state(cfg))
    for name in ("f", "g"):
        a, b = np.asarray(getattr(s_sh, name)), np.asarray(getattr(s_ref, name))
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12 * max(scale, 1.0),
                                   err_msg=name)


@pytest.mark.parametrize("n_dev,kill", [(4, True), (2, False)])
def test_sharded_fused_3d_multistep_matches_jnp(n_dev, kill):
    """3-D multi-chip temporal blocking: K-deep ghost z-slabs exchanged
    once per window, the per-step fused 3-D kernel k times on the
    extended volume, interior slice exact (z-wrap corruption travels one
    slice/step and never crosses the K-slab ghost zone). f64 vs the
    single-device jnp rollout, remainder window included (3 = 2 + 1)."""
    from lbm_tpu.config import CompatFlags
    from lbm_tpu.models import plasma3d

    compat = (CompatFlags() if kill
              else CompatFlags(none_solver_kills_external_field=False))
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=16, NY=16, NZ=2 * n_dev, dtype=jnp.float64,
        poisson=PoissonSolver.NONE, backend="fused", multistep=2,
        kernel_interpret=True, compat=compat)
    devs = np.asarray(jax.devices()[:n_dev]).reshape(n_dev)
    mesh = Mesh(devs, (fused_sharded.AXIS_Z,))
    roll = fused_sharded.make_fused_sharded_multistep_rollout_3d(
        cfg, mesh, 3)
    s = roll(plasma3d.init_state(cfg))
    assert int(s.step) == 3
    ref_cfg = dataclasses.replace(cfg, backend="jnp", multistep=0)
    ref = jax.jit(plasma3d.make_rollout(ref_cfg, 3))(
        plasma3d.init_state(ref_cfg))
    for name in ("f", "g", "Ex", "Ez"):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(s, name), np.float64)
        scale = max(np.abs(a).max(), 1e-300)
        assert np.abs(a - b).max() / scale < 1e-13, name


def test_sharded_fused_3d_multistep_validates():
    devs4 = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs4, (fused_sharded.AXIS_Z,))
    base = dict(NX=16, NY=16, NZ=8, backend="fused", kernel_interpret=True,
                poisson=PoissonSolver.NONE)
    with pytest.raises(ValueError, match="multistep"):
        fused_sharded.make_fused_sharded_multistep_rollout_3d(
            dataclasses.replace(PlasmaConfig(), **base, multistep=0),
            mesh, 4)
    with pytest.raises(ValueError, match="NONE"):
        # 3-D multistep with a global solver is refused at config level
        # already (config.py); the constructor must refuse too
        fused_sharded.make_fused_sharded_multistep_rollout_3d(
            dataclasses.replace(PlasmaConfig(),
                                **{**base, "poisson": PoissonSolver.FFT},
                                multistep=2), mesh, 4)
    with pytest.raises(ValueError, match="one-hop"):
        # K deeper than a shard's z extent
        fused_sharded.make_fused_sharded_multistep_rollout_3d(
            dataclasses.replace(PlasmaConfig(), **base, multistep=4),
            mesh, 4)


def test_sharded_fused_3d_yz_validates():
    from lbm_tpu.parallel.fused_sharded import AXIS_Z as _AZ
    from lbm_tpu.parallel.mesh import AXIS_Y as _AY

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, (_AZ, _AY))
    with pytest.raises(ValueError, match="divisible"):
        fused_sharded.make_fused_sharded_step3d_yz(
            dataclasses.replace(PlasmaConfig(), NX=16, NY=32, NZ=5), mesh)
    with pytest.raises(ValueError, match="divisible"):
        fused_sharded.make_fused_sharded_step3d_yz(
            dataclasses.replace(PlasmaConfig(), NX=16, NY=33, NZ=4), mesh)
    with pytest.raises(ValueError, match="feasible"):
        # divisible, but the per-shard cross-section fits no panel height
        fused_sharded.make_fused_sharded_step3d_yz(
            dataclasses.replace(PlasmaConfig(), NX=16, NY=30, NZ=4), mesh)


# ---------------------------------------------------------------------------
# make_fused_sharded_step3d_auto: the mesh-selection table as code
# ---------------------------------------------------------------------------

def test_auto3d_picks_z_and_runs():
    """Deep narrow column -> z-sharded slice halos; the returned
    (step, mesh, shardings) triple runs and matches the jnp oracle."""
    from lbm_tpu.models import plasma3d

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=8, NZ=16,
                              dtype=jnp.float64)
    step, mesh, sh = fused_sharded.make_fused_sharded_step3d_auto(
        cfg, jax.devices()[:8])
    assert mesh.axis_names == (fused_sharded.AXIS_Z,)
    assert mesh.shape[fused_sharded.AXIS_Z] == 8

    s = jax.tree.map(jax.device_put, plasma3d.init_state(cfg), sh)
    out = step(s)
    ref = jax.jit(plasma3d.make_step(cfg))(plasma3d.init_state(cfg))
    np.testing.assert_allclose(np.asarray(out.f), np.asarray(ref.f),
                               rtol=1e-11, atol=0)


def test_auto3d_picks_y_for_wide_cross_section():
    """A cross-section past the slice kernels' VMEM gate (128x256 f64
    fails fused_step3d.check_vmem3d) -> y-sharded panels."""
    cfg = dataclasses.replace(PlasmaConfig(), NX=256, NY=128, NZ=16,
                              dtype=jnp.float64)
    _, mesh, sh = fused_sharded.make_fused_sharded_step3d_auto(
        cfg, jax.devices()[:8])
    assert mesh.axis_names == (AXIS_Y,)
    assert mesh.shape[AXIS_Y] == 8
    assert sh.f.spec == jax.sharding.PartitionSpec(
        None, None, None, AXIS_Y, None)


def test_auto3d_picks_yz_mesh():
    """NZ indivisible by 8 and panels too thin at dy=8 -> the first
    feasible (dz, dy) factorization (dy ascending: dy=1 fails NZ%8,
    dy=2 -> (4, 2))."""
    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=32, NZ=12,
                              dtype=jnp.float64)
    _, mesh, _ = fused_sharded.make_fused_sharded_step3d_auto(
        cfg, jax.devices()[:8])
    assert mesh.axis_names == (fused_sharded.AXIS_Z, AXIS_Y)
    assert mesh.shape[fused_sharded.AXIS_Z] == 4
    assert mesh.shape[AXIS_Y] == 2


def test_auto3d_raises_when_nothing_fits():
    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=7, NZ=7,
                              dtype=jnp.float64)
    with pytest.raises(ValueError, match="no feasible 3-D decomposition"):
        fused_sharded.make_fused_sharded_step3d_auto(cfg, jax.devices()[:8])


def test_auto_2d_picker():
    """make_fused_sharded_step_auto: 1-D pick when rows divide, 2-D when
    only a factorization does, GSPMD when the BC forbids fused halos; the
    picked step matches the single-device jnp path."""
    import numpy as _np
    from jax.sharding import Mesh as _Mesh
    from lbm_tpu.config import BC

    devs = jax.devices()[:4]

    # rows divide 8*4 -> 1-D (dy) pick
    cfg1 = dataclasses.replace(PlasmaConfig(), NX=32, NY=64,
                               dtype=jnp.float64)
    step, mesh, sh = fused_sharded.make_fused_sharded_step_auto(cfg1, devs)
    assert dict(mesh.shape) == {"dy": 4, "dx": 1}

    # NY=16 can't take 8*4 rows but (2, 2) divides both axes -> 2-D pick
    cfg2 = dataclasses.replace(PlasmaConfig(), NX=16, NY=16,
                               dtype=jnp.float64)
    step2, mesh2, sh2 = fused_sharded.make_fused_sharded_step_auto(
        cfg2, devs)
    assert dict(mesh2.shape) == {"dy": 2, "dx": 2}
    s0 = plasma.init_state(cfg2)
    out = step2(jax.tree.map(jax.device_put, s0, sh2))
    ref = jax.jit(plasma.make_step(dataclasses.replace(
        cfg2, backend="jnp")))(s0)
    np.testing.assert_allclose(np.asarray(out.f), np.asarray(ref.f),
                               rtol=1e-11, atol=0)

    # bounce-back -> GSPMD fallback
    cfg3 = dataclasses.replace(PlasmaConfig(), NX=16, NY=16,
                               dtype=jnp.float64, bc=BC.BOUNCE_BACK)
    _, mesh3, _ = fused_sharded.make_fused_sharded_step_auto(cfg3, devs)
    assert sorted(mesh3.axis_names) == ["dx", "dy"]

    # indivisible grid -> clear error
    cfg4 = dataclasses.replace(PlasmaConfig(), NX=17, NY=13)
    with pytest.raises(ValueError, match="decomposition"):
        fused_sharded.make_fused_sharded_step_auto(cfg4, devs)
