"""Equilibrium moment identities + oracle agreement."""
import jax.numpy as jnp
import numpy as np

from lbm_tpu.constants import D2Q9
from lbm_tpu.ops.equilibrium import equilibrium

import oracle


def _rand_fields(shape, rng, umax=0.05):
    rho = 1.0 + rng.random(shape)
    ux = umax * (2 * rng.random(shape) - 1)
    uy = umax * (2 * rng.random(shape) - 1)
    return rho, ux, uy


def test_equilibrium_moments():
    rng = np.random.default_rng(0)
    rho, ux, uy = _rand_fields((6, 8), rng)
    cs2 = 1.0 / 3.0
    eq = np.asarray(equilibrium(jnp.asarray(rho), jnp.asarray(ux), jnp.asarray(uy), cs2))
    cx = D2Q9.CX.astype(float)[:, None, None]
    cy = D2Q9.CY.astype(float)[:, None, None]
    # zeroth and first moments are exact properties of the 2nd-order expansion
    np.testing.assert_allclose(eq.sum(0), rho, rtol=1e-12)
    np.testing.assert_allclose((eq * cx).sum(0), rho * ux, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose((eq * cy).sum(0), rho * uy, rtol=1e-10, atol=1e-14)


def test_equilibrium_matches_oracle():
    rng = np.random.default_rng(1)
    rho, ux, uy = _rand_fields((5, 7), rng)
    from lbm_tpu.config import PlasmaConfig
    cs2 = PlasmaConfig().units().cs2
    mine = np.asarray(
        equilibrium(jnp.asarray(rho), jnp.asarray(ux), jnp.asarray(uy), cs2)
    )

    class _FakeU:  # oracle.eq only needs .cs2
        pass

    o = oracle.Oracle.__new__(oracle.Oracle)
    fake = _FakeU(); fake.cs2 = cs2
    o.u = fake
    ref = o.eq(rho, ux, uy)
    np.testing.assert_allclose(mine, ref, rtol=1e-13, atol=0)
