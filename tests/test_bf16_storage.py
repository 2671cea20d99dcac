"""bf16 population-storage mode (cfg.storage == "bf16").

f and g cross HBM in bfloat16; every moment/collision/Poisson computation
runs in cfg.dtype in-register, and the storage rounding happens exactly
once per step, at the final write. This halves the dominant HBM traffic of
the bandwidth-bound step (docs/STATUS.md roofline: 432 B/site -> 216) as an
opt-in fast mode. The fused kernel must reproduce the jnp semantics
bitwise, and the mode must keep macroscopic drift vs native-f32 bounded at
the bf16-rounding level over short windows.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma


def _cfg(bc=BC.PERIODIC, backend="jnp", storage="bf16", n=24, **kw):
    return dataclasses.replace(
        PlasmaConfig(), NX=n, NY=32, dtype=jnp.float32, bc=bc,
        poisson=PoissonSolver.FFT, neutral_delta=True, storage=storage,
        backend=backend, **kw)


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.BOUNCE_BACK])
def test_fused_kernel_matches_jnp(bc):
    """Kernel (interpret mode) vs jnp step in bf16-storage mode.

    f/Ex/Ey/phi/rho_q are BITWISE equal: the in-kernel cast points sit at
    the same algebraic positions as the jnp path's step-boundary casts,
    rounding commutes with the streaming permutation, and the thermal
    populations never feed back into the mass/field dynamics (the DDF
    coupling is one-way). g carries the approx-reciprocal difference of
    the kernel's fast thermal term (~1.6e-5 rel before storage rounding,
    at most a couple of bf16 ulps after), so it gets a tolerance."""
    cfg_j = _cfg(bc=bc)
    cfg_k = _cfg(bc=bc, backend="fused", kernel_interpret=True)
    s_j = plasma.init_state(cfg_j)
    s_k = plasma.init_state(cfg_k)
    step_j = jax.jit(plasma.make_step(cfg_j))
    step_k = jax.jit(plasma.make_step(cfg_k))
    for t in range(3):
        s_j = step_j(s_j)
        s_k = step_k(s_k)
        for name in ("f", "Ex", "Ey", "phi"):
            a = np.asarray(getattr(s_j, name), dtype=np.float64)
            b = np.asarray(getattr(s_k, name), dtype=np.float64)
            assert np.array_equal(a, b), (
                f"{name} step {t}: max|d|={np.abs(a - b).max()}")
        a = np.asarray(s_j.g, dtype=np.float64)
        b = np.asarray(s_k.g, dtype=np.float64)
        for s in range(3):
            scale = np.abs(a[s]).max()
            d = np.abs(a[s] - b[s]).max()
            assert d <= 2e-2 * scale, f"g[{s}] step {t}: {d/scale:.2e}"


def test_storage_dtype_and_field_dtypes():
    """Populations live in bf16; fields/phi stay cfg.dtype."""
    cfg = _cfg()
    s = plasma.init_state(cfg)
    assert s.f.dtype == jnp.bfloat16 and s.g.dtype == jnp.bfloat16
    assert s.Ex.dtype == jnp.float32 and s.phi.dtype == jnp.float32
    s = jax.jit(plasma.make_step(cfg))(s)
    assert s.f.dtype == jnp.bfloat16 and s.g.dtype == jnp.bfloat16
    assert s.Ex.dtype == jnp.float32


def test_drift_vs_native_f32_bounded():
    """Short-window macroscopic drift vs native f32 stays at the
    bf16-rounding level (the ion/neutral channels ~1e-2; the chaotic
    electron channel is looser but must not blow up)."""
    cfg32 = _cfg(storage="native", n=64)
    cfgb = _cfg(n=64)
    s32, sb = plasma.init_state(cfg32), plasma.init_state(cfgb)
    st32 = jax.jit(plasma.make_step(cfg32))
    stb = jax.jit(plasma.make_step(cfgb))
    for _ in range(20):
        s32 = st32(s32)
        sb = stb(sb)
    m32 = plasma.compute_macros(cfg32, s32)
    mb = plasma.compute_macros(cfgb, sb)
    for name, tol in (("rho", 5e-2), ("ux", 0.3), ("uy", 0.3), ("T", 0.3)):
        a = np.asarray(getattr(m32, name), np.float64)
        b = np.asarray(getattr(mb, name), np.float64)
        for s in range(3):
            scale = np.abs(a[s]).max()
            d = np.abs(a[s] - b[s]).max()
            assert np.isfinite(b[s]).all(), f"{name}[{s}] non-finite"
            assert d <= tol * scale, f"{name}[{s}] drift {d/scale:.2e}"


def test_pallas_backend_rejected():
    with pytest.raises(ValueError):
        plasma.make_step(_cfg(backend="pallas"))


def test_checkpoint_roundtrip_bf16(tmp_path):
    """npz has no bfloat16; the checkpoint stores the raw bits as tagged
    uint16 and restores them bit-exactly with dtype=None (resume must not
    re-round). An EXPLICIT dtype upcasts the bf16 bits instead (a parity/
    analysis load must not get mixed precision)."""
    from lbm_tpu.io import checkpoint as ckpt

    cfg = _cfg()
    s = jax.jit(plasma.make_step(cfg))(plasma.init_state(cfg))
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, s)
    s2 = ckpt.load(path)
    assert s2.f.dtype == jnp.bfloat16 and s2.Ex.dtype == jnp.float32
    assert np.array_equal(np.asarray(s2.f).view(np.uint16),
                          np.asarray(s.f).view(np.uint16))
    assert np.array_equal(np.asarray(s2.Ex), np.asarray(s.Ex))
    s3 = ckpt.load(path, dtype=cfg.dtype)
    assert s3.f.dtype == jnp.float32 and s3.Ex.dtype == jnp.float32
    assert np.array_equal(np.asarray(s3.f),
                          np.asarray(s2.f).astype(np.float32))
