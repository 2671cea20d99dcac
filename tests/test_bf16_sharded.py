"""bf16-storage mode through the sharded fused paths.

The shard_map wrappers are dtype-agnostic: bf16 populations flow through
the ppermute halo exchange (halving the per-step ICI bytes along with the
HBM bytes) and the halo kernels do the same load->f32 / f32->store casts
as the single-chip kernel.

Strictness: the GSPMD path (same HLO, partitioned) is BITWISE vs
single-device under the NONE solver. The shard_map halo-kernel paths are
held to tight per-species scale-relative tolerances instead: in interpret
mode the kernel body lowers to plain HLO inside the larger shard_map
program, where XLA's fusion/FMA choices differ from the single-device
lowering and flip last bits in the cancellation-heavy box-edge neutral
delta cells (~1e-7 absolute — the same inherent f32 cancellation noise
that makes the f64 sharded tests use rtol 1e-11 rather than bitwise).
Under FFT the GSPMD-sharded spectral solve also rounds differently than
the single-device FFT, perturbing E at ~1e-15 rel. g additionally carries
the kernel's approx-reciprocal fast thermal term
(cf. tests/test_bf16_storage.py).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from lbm_tpu.config import PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma
from lbm_tpu.parallel import fused_sharded
from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y


def _cfg(solver=PoissonSolver.NONE, **kw):
    return dataclasses.replace(
        PlasmaConfig(), NX=32, NY=64, dtype=jnp.float32,
        poisson=solver, neutral_delta=True, storage="bf16", **kw)


def _run_pair(cfg, step_sh, steps=3):
    step_ref = jax.jit(plasma.make_step(cfg))
    s_sh = plasma.init_state(cfg)
    s_ref = plasma.init_state(cfg)
    for _ in range(steps):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    return s_sh, s_ref


def _check(s_sh, s_ref, tag, tight_f):
    f_tol = 1e-3 if tight_f else 1e-2
    for name in ("f", "Ex", "Ey"):
        a = np.asarray(getattr(s_ref, name), dtype=np.float64)
        b = np.asarray(getattr(s_sh, name), dtype=np.float64)
        if name == "f":
            for s in range(3):
                scale = max(np.abs(a[s]).max(), 1e-300)
                assert np.abs(a[s] - b[s]).max() <= f_tol * scale, (
                    f"{tag} f[{s}]: {np.abs(a[s]-b[s]).max()/scale:.2e}")
        else:
            scale = max(np.abs(a).max(), 1e-300)
            assert np.abs(a - b).max() <= f_tol * scale, (
                f"{tag} {name}: {np.abs(a-b).max()/scale:.2e} of scale")
    a = np.asarray(s_ref.g, dtype=np.float64)
    b = np.asarray(s_sh.g, dtype=np.float64)
    for s in range(3):
        scale = np.abs(a[s]).max()
        assert np.abs(a[s] - b[s]).max() <= 2e-2 * scale, (
            f"{tag} g[{s}]: {np.abs(a[s]-b[s]).max()/scale:.2e}")


@pytest.mark.parametrize("solver", [PoissonSolver.NONE, PoissonSolver.FFT])
def test_sharded_1d_bf16_matches_single(solver):
    cfg = _cfg(solver)
    devs = np.asarray(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devs, (AXIS_Y, AXIS_X))
    step_sh = fused_sharded.make_fused_sharded_step(cfg, mesh)
    s_sh, s_ref = _run_pair(cfg, step_sh)
    assert s_sh.f.dtype == jnp.bfloat16
    _check(s_sh, s_ref, "1d", tight_f=solver == PoissonSolver.NONE)


@pytest.mark.parametrize("solver", [PoissonSolver.NONE, PoissonSolver.FFT])
def test_sharded_2d_bf16_matches_single(solver):
    cfg = _cfg(solver)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, (AXIS_Y, AXIS_X))
    step_sh = fused_sharded.make_fused_sharded_step_2d(cfg, mesh)
    s_sh, s_ref = _run_pair(cfg, step_sh)
    _check(s_sh, s_ref, "2d", tight_f=solver == PoissonSolver.NONE)


@pytest.mark.parametrize("solver", [PoissonSolver.NONE, PoissonSolver.FFT])
def test_sharded_3d_y_bf16_matches_single(solver):
    """bf16 through the y-sharded 3-D path (shards = panels of the
    paneled kernel, 1-row ICI halo protocol). Same tolerance class as
    the 2-D halo paths; under FFT the slab-decomposed solve additionally
    transforms x, z, y instead of x, y, z (last-bit reordering)."""
    from lbm_tpu.models import plasma3d

    cfg = dataclasses.replace(
        PlasmaConfig(), NX=16, NY=64, NZ=8, dtype=jnp.float32,
        poisson=solver, neutral_delta=True, storage="bf16")
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, (AXIS_Y,))
    step_sh = fused_sharded.make_fused_sharded_step3d_y(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(
        dataclasses.replace(cfg, backend="jnp")))
    s_sh = plasma3d.init_state(cfg)
    s_ref = plasma3d.init_state(cfg)
    for _ in range(3):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    assert s_sh.f.dtype == jnp.bfloat16
    f_tol = 1e-3 if solver == PoissonSolver.NONE else 1e-2
    for name, tol in (("f", f_tol), ("g", 2e-2), ("Ex", f_tol),
                      ("Ey", f_tol), ("Ez", f_tol)):
        a = np.asarray(getattr(s_ref, name), dtype=np.float64)
        b = np.asarray(getattr(s_sh, name), dtype=np.float64)
        if name in ("f", "g"):
            for s in range(3):
                scale = max(np.abs(a[s]).max(), 1e-300)
                assert np.abs(a[s] - b[s]).max() <= tol * scale, (
                    f"3d-y {name}[{s}]: "
                    f"{np.abs(a[s]-b[s]).max()/scale:.2e}")
        else:
            scale = max(np.abs(a).max(), 1e-300)
            assert np.abs(a - b).max() <= tol * scale, (
                f"3d-y {name}: {np.abs(a-b).max()/scale:.2e} of scale")


def test_sharded_3d_yz_bf16_matches_single():
    """bf16 through the (dz, dy) 2-D-mesh 3-D path (z-slice + y-row +
    corner-row halos, z-halo panel kernel). Same tolerance class as the
    1-D sharded paths."""
    from lbm_tpu.models import plasma3d
    from lbm_tpu.parallel.fused_sharded import AXIS_Z

    cfg = dataclasses.replace(
        PlasmaConfig(), NX=16, NY=32, NZ=6, dtype=jnp.float32,
        poisson=PoissonSolver.FFT, neutral_delta=True, storage="bf16")
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, (AXIS_Z, AXIS_Y))
    step_sh = fused_sharded.make_fused_sharded_step3d_yz(cfg, mesh)
    step_ref = jax.jit(plasma3d.make_step(
        dataclasses.replace(cfg, backend="jnp")))
    s_sh = plasma3d.init_state(cfg)
    s_ref = plasma3d.init_state(cfg)
    for _ in range(3):
        s_sh = step_sh(s_sh)
        s_ref = step_ref(s_ref)
    assert s_sh.f.dtype == jnp.bfloat16
    for name, tol in (("f", 1e-2), ("g", 2e-2), ("Ex", 1e-2),
                      ("Ey", 1e-2), ("Ez", 1e-2)):
        a = np.asarray(getattr(s_ref, name), dtype=np.float64)
        b = np.asarray(getattr(s_sh, name), dtype=np.float64)
        if name in ("f", "g"):
            for s in range(3):
                scale = max(np.abs(a[s]).max(), 1e-300)
                assert np.abs(a[s] - b[s]).max() <= tol * scale, (
                    f"3d-yz {name}[{s}]: "
                    f"{np.abs(a[s]-b[s]).max()/scale:.2e}")
        else:
            scale = max(np.abs(a).max(), 1e-300)
            assert np.abs(a - b).max() <= tol * scale, (
                f"3d-yz {name}: {np.abs(a-b).max()/scale:.2e} of scale")


def test_gspmd_bf16_matches_single():
    """The GSPMD path (plain jnp step jitted with lattice shardings) in
    bf16 mode, NONE solver: exact vs single-device (same HLO,
    partitioned; no FFT to re-round)."""
    from lbm_tpu.parallel import sharding as shard_mod

    cfg = _cfg(PoissonSolver.NONE)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, (AXIS_Y, AXIS_X))
    step_sh = shard_mod.make_sharded_step(cfg, mesh, donate=False)
    s_sh, s_ref = _run_pair(cfg, step_sh)
    for name in ("f", "g", "Ex", "Ey"):
        a = np.asarray(getattr(s_ref, name), dtype=np.float64)
        b = np.asarray(getattr(s_sh, name), dtype=np.float64)
        assert np.array_equal(a, b), (
            f"gspmd {name}: max|d|={np.abs(a - b).max()}")
