"""Permuted four-step FFT Poisson solve (kernels/fft_tpu.py).

Validates the transform algebra (vs numpy FFT with the permutation
applied), the XLA oracle solve (vs solve_fft + efield_periodic), and the
Pallas kernel path in interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.kernels import fft_tpu as F
from lbm_tpu.ops import poisson as P


@pytest.mark.parametrize("N", [128, 256, 1024])
def test_fft_x_permuted_matches_numpy(N):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, N)).astype(np.float32)
    y = rng.standard_normal((4, N)).astype(np.float32)
    plan = F.make_axis_plan(N)
    tb = F._tables(plan)
    zr, zi = F.fft_x_permuted(jnp.asarray(x), jnp.asarray(y), plan.A, tb)
    ref = np.fft.fft(x + 1j * y, axis=1)[:, F.perm_indices(N)]
    got = np.asarray(zr) + 1j * np.asarray(zi)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    # unnormalized inverse round-trips
    br, bi = F.fft_x_permuted(zr, zi, plan.A, tb, conj=True)
    assert np.abs(np.asarray(br) / N - x).max() < 1e-4
    assert np.abs(np.asarray(bi) / N - y).max() < 1e-4


def test_fft_y_permuted_matches_numpy():
    N, C = 512, 256
    rng = np.random.default_rng(1)
    x = rng.standard_normal((N, C)).astype(np.float32)
    plan = F.make_axis_plan(N)
    tb = F._tables(plan, y_form=True)
    zr, zi = F.fft_y_permuted(jnp.asarray(x), jnp.zeros((N, C), jnp.float32),
                              plan.A, tb)
    ref = np.fft.fft(x, axis=0)[F.perm_indices(N), :]
    got = np.asarray(zr) + 1j * np.asarray(zi)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5
    br, _ = F.fft_y_permuted(zr, zi, plan.A, tb, conj=True)
    assert np.abs(np.asarray(br) / N - x).max() < 1e-4


@pytest.mark.parametrize("shape", [(256, 256), (512, 256), (128, 512)])
def test_xla_oracle_matches_packed_solve(shape):
    NY, NX = shape
    rng = np.random.default_rng(2)
    rho = jnp.asarray(rng.standard_normal((NY, NX)).astype(np.float32) * 1e-8)
    Ex, Ey = P.efield_periodic(P.solve_fft(rho))
    Ex2, Ey2 = F.solve_fft_efield_xla(rho)
    sc = float(jnp.abs(Ex).max())
    assert float(jnp.abs(Ex - Ex2).max()) / sc < 2e-5
    assert float(jnp.abs(Ey - Ey2).max()) / sc < 2e-5


@pytest.mark.parametrize("shape", [(256, 256), (128, 256), (256, 128)])
def test_pallas_kernels_match_oracle_interpret(shape):
    """Includes the A == 1 axes (length exactly 128): no Stockham stages,
    pure matmul DFT — the stage-table placeholder must not make a
    zero-size VMEM block (regression: ZeroDivisionError in block
    padding)."""
    NY, NX = shape
    rng = np.random.default_rng(3)
    rho = jnp.asarray(rng.standard_normal((NY, NX)).astype(np.float32) * 1e-8)
    Ex, Ey = F.solve_fft_efield_xla(rho)
    Ex2, Ey2 = F.solve_fft_efield_tpu(rho, interpret=True)
    sc = float(jnp.abs(Ex).max())
    assert float(jnp.abs(Ex - Ex2).max()) / sc < 1e-5
    assert float(jnp.abs(Ey - Ey2).max()) / sc < 1e-5


def test_supports():
    assert F.supports(2048, 2048) and F.supports(1024, 4096)
    assert F.supports(128, 256)
    assert not F.supports(200, 200)     # golden grid: not A*128
    assert not F.supports(2048, 1536)   # 12*128: A not a power of two
