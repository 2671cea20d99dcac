"""2-D (row x column) sharded fused step vs single-device jnp path."""
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


def _mesh(ny, nx):
    devs = np.asarray(jax.devices()[: ny * nx]).reshape(ny, nx)
    return Mesh(devs, (AXIS_Y, AXIS_X))


@pytest.mark.parametrize("mesh_shape", [(2, 2), (2, 4), (1, 4), (4, 1)])
def test_2d_sharded_matches_single(mesh_shape):
    cfg = dataclasses.replace(PlasmaConfig(), NX=64, NY=64,
                              dtype=jnp.float64, poisson=PoissonSolver.FFT)
    mesh = _mesh(*mesh_shape)

    s_ref = plasma.init_state(cfg)
    step_ref = jax.jit(plasma.make_step(cfg))
    step_sh = fused_sharded.make_fused_sharded_step_2d(cfg, mesh)
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
    np.testing.assert_allclose(np.asarray(s_sh.Ey), np.asarray(s_ref.Ey),
                               rtol=1e-9, atol=1e-16)


def test_2d_rejects_indivisible():
    cfg = dataclasses.replace(PlasmaConfig(), NX=40, NY=64)
    with pytest.raises(ValueError):
        fused_sharded.make_fused_sharded_step_2d(cfg, _mesh(2, 2))
