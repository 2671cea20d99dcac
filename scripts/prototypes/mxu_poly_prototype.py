#!/usr/bin/env python
"""Round-2 prototype: equilibrium polynomials on the MXU.

The fused kernels are VPU-bound; the equilibrium polynomial
    wpoly_i(u) = w_i (1 + c_i.u/cs2 + (c_i.u)^2/(2cs2^2) - |u|^2/(2cs2))
is a constant (9, 6) matrix M applied to the per-cell feature vector
[1, ux, uy, ux^2, ux*uy, uy^2], i.e. a GEMM the MXU can execute while the
VPU does the BGK algebra.

Validated findings (TPU v5e, jax 0.9):
  * Pallas accepts the dot when M is passed as a kernel OPERAND (captured
    array constants are forbidden) and the (6, ty, NX) feature stack is
    reshaped to (6, ty*NX).
  * precision MUST be jax.lax.Precision.HIGHEST: the default single-pass
    bf16 MXU product gives ~1e-3 relative error, far above the 3e-6
    C++-parity gate; HIGHEST (3-pass) matches the VPU form to ~1e-7.

Run: python scripts/prototypes/mxu_poly_prototype.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.constants import D2Q9


def poly_matrix(cs2: float) -> np.ndarray:
    inv = 1.0 / cs2
    M = np.zeros((9, 6), np.float32)
    for i in range(9):
        cx, cy, w = float(D2Q9.CX[i]), float(D2Q9.CY[i]), float(D2Q9.W[i])
        b = inv * inv / 2
        M[i] = w * np.array([1.0, cx * inv, cy * inv,
                             cx * cx * b - inv / 2, 2 * cx * cy * b,
                             cy * cy * b - inv / 2])
    return M


def main():
    ty, NX = 8, 1024

    def kernel(m_ref, ux_ref, uy_ref, out_ref):
        ux = ux_ref[:]
        uy = uy_ref[:]
        feats = jnp.stack([jnp.ones_like(ux), ux, uy,
                           ux * ux, ux * uy, uy * uy]).reshape(6, ty * NX)
        wp = jax.lax.dot_general(
            m_ref[:], feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = wp.reshape(9, ty, NX)

    @jax.jit
    def run(m, ux, uy):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=[
                pl.BlockSpec((9, 6), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ty, NX), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ty, NX), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((9, ty, NX), lambda k: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((9, ty, NX), jnp.float32),
        )(m, ux, uy)

    rng = np.random.default_rng(0)
    ux = rng.random((ty, NX)).astype(np.float32) * 0.1
    uy = rng.random((ty, NX)).astype(np.float32) * 0.1
    M = poly_matrix(1.0 / 3.0)
    out = np.asarray(run(jnp.asarray(M), jnp.asarray(ux), jnp.asarray(uy)))
    feats = np.stack([np.ones_like(ux), ux, uy, ux * ux, ux * uy, uy * uy])
    ref = np.einsum("ik,kxy->ixy", M.astype(np.float64),
                    feats.astype(np.float64))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    print(f"MXU poly vs f64 einsum: max rel err {rel:.2e}")
    assert rel < 1e-6, "needs Precision.HIGHEST"


if __name__ == "__main__":
    main()
