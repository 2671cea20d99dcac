"""Pin scripts/visualize_fields.py's checkpoint-macro loading.

The offline visualizer (the TPU-native analog of the reference's
``old codes/LBM_classic/Python visualize/`` scripts) must honor the
checkpoint's layout metadata: delta-stored neutrals plot as FULL
densities (background reconstructed), bf16 populations are upcast before
the moment sums, and 3-D checkpoints plot a selected z-slice.
"""
import dataclasses
import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "visualize_fields",
        os.path.join(REPO, "scripts", "visualize_fields.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_load_macros_2d_delta_bf16(tmp_path):
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.io import checkpoint as ckpt
    from lbm_tpu.models import plasma

    cfg = dataclasses.replace(
        PlasmaConfig(), NX=16, NY=16, dtype=jnp.float32,
        storage="bf16", neutral_delta=True)
    state = plasma.init_state(cfg)
    assert state.f.dtype == jnp.bfloat16
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state, neutral_delta=True, storage="bf16")

    rho, ux, uy, rho_q, step = _mod()._load_macros(path, None)
    assert step == 0
    assert rho[2].shape == (16, 16) and rho_q.shape == (16, 16)
    # delta-stored neutrals must reconstruct the uniform background
    # (~1.8e10 lattice units at the golden scaling), not plot as ~0
    ref = float(cfg.units().rho_n_init)
    assert np.all(np.abs(np.asarray(rho[2], np.float64) - ref) <= 1e-2 * ref)
    # the seeded center box shows up in the electron density
    assert float(rho[0][8, 8]) > 0.0 and float(rho[0][0, 0]) == 0.0


def test_load_macros_2d_classic_defaults_without_metadata(tmp_path):
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.io import checkpoint as ckpt
    from lbm_tpu.models import plasma

    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=16,
                              dtype=jnp.float32, neutral_delta=False)
    state = plasma.init_state(cfg)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state)  # no metadata: pre-metadata checkpoint

    rho, _, _, _, _ = _mod()._load_macros(path, None)
    ref = float(cfg.units().rho_n_init)
    assert np.all(np.abs(np.asarray(rho[2], np.float64) - ref) <= 1e-2 * ref)


def test_load_macros_3d_z_slice(tmp_path):
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.io import checkpoint as ckpt
    from lbm_tpu.models import plasma3d

    cfg = dataclasses.replace(
        PlasmaConfig(), NX=12, NY=12, NZ=4, dtype=jnp.float32,
        neutral_delta=True)
    state = plasma3d.init_state(cfg)
    path = str(tmp_path / "ck3.npz")
    ckpt.save3d(path, state, neutral_delta=True, storage="native")

    m = _mod()
    rho, ux, uy, rho_q, step = m._load_macros(path, None)  # midplane
    assert rho_q.shape == (12, 12) and rho[2].shape == (12, 12)
    ref = float(cfg.units().rho_n_init)
    assert np.all(np.abs(np.asarray(rho[2], np.float64) - ref) <= 1e-2 * ref)

    with pytest.raises(SystemExit):
        m._load_macros(path, 4)  # z-slice out of range [0, NZ)


def test_plot_cavity_checkpoint(tmp_path):
    import jax
    import jax.numpy as jnp

    from lbm_tpu.config import CavityConfig
    from lbm_tpu.io import checkpoint as ckpt
    from lbm_tpu.models import cavity

    cfg = CavityConfig(NX=24, NY=24, nsteps=40, storage="bf16")
    s = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    path = str(tmp_path / "cav.npz")
    ckpt.save_cavity(path, s, storage="bf16")

    m = _mod()
    out = str(tmp_path / "plots")
    m._plot_cavity(path, out)
    for name in ("density.png", "velocity.png", "streamlines.png"):
        assert os.path.exists(os.path.join(out, name))
