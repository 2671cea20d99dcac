"""Lid-driven cavity: Ghia (1982) validation + behavioral tests.

This automates the reference's course-mandated correctness check (compare
centerline u/v profiles at Re=100 on a 129^2 grid against Ghia's tables —
Papers/AMSC_LBM_hands_on_proposal.pdf p.1), which the reference only did
offline.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.config import CavityConfig
from lbm_tpu.models import cavity


def test_ghia_re100_centerlines():
    cfg = CavityConfig(dtype=jnp.float64)
    assert abs(cfg.tau - 0.887) < 1e-12  # 3*(0.1*129/100)+0.5
    s = cavity.init_state(cfg)
    s = jax.jit(cavity.make_rollout(cfg))(s)
    (yp, up), (xp, vp) = cavity.centerline_profiles(s, cfg.u_lid)
    ug = np.interp(cavity.GHIA_Y, yp, up)
    vg = np.interp(cavity.GHIA_X, xp, vp)
    eu = np.abs(ug - cavity.GHIA_U_RE100)
    ev = np.abs(vg - cavity.GHIA_V_RE100)
    # 129^2 BGK-LBM accuracy envelope (reference achieves the same order)
    assert eu.max() < 0.035 and np.sqrt((eu**2).mean()) < 0.02
    assert ev.max() < 0.02 and np.sqrt((ev**2).mean()) < 0.01


def test_mass_conservation():
    cfg = CavityConfig(NX=33, NY=33, nsteps=200, dtype=jnp.float64)
    s = cavity.init_state(cfg)
    m0 = float(s.f.sum())
    s = jax.jit(cavity.make_rollout(cfg))(s)
    assert abs(float(s.f.sum()) - m0) / m0 < 1e-12


def test_lid_ramp():
    """During the ramp (t < sigma) the lid speed is u_lid * t / sigma."""
    cfg = CavityConfig(NX=17, NY=17, nsteps=3, dtype=jnp.float64)
    s = cavity.init_state(cfg)
    step = jax.jit(cavity.make_step(cfg))
    s1 = step(s)  # t=0: lid speed 0 -> flow stays exactly at rest
    assert float(jnp.abs(s1.ux).max()) == 0.0
    s2 = step(s1)  # t=1: lid starts moving
    assert float(jnp.abs(s2.ux).max()) > 0.0
    # motion appears only at the lid row
    assert float(jnp.abs(s2.ux[:-1]).max()) == 0.0


def test_top_row_follows_lid_direction():
    cfg = CavityConfig(NX=33, NY=33, nsteps=300, dtype=jnp.float64)
    s = cavity.init_state(cfg)
    s = jax.jit(cavity.make_rollout(cfg))(s)
    # row just below the lid moves with the lid (+x)
    assert float(s.ux[-2, 5:-5].mean()) > 0.0


def test_stability_autoresize():
    """tau outside [0.5, 2] resizes the grid like the Stability variant
    (old codes/LBM_classic/Stability/LBM_f.cpp:31-53)."""
    cfg = CavityConfig(NX=1000, NY=1000, u_lid=0.3, Re=100.0)
    assert cfg.tau > 2.0
    cfg2 = cfg.with_stability_guard()
    assert cfg2.NY == int(100.0 * 1.5 / (3 * 0.3))
    assert 0.5 <= cfg2.tau <= 2.0

    cfg3 = CavityConfig(NX=10, NY=10, u_lid=0.01, Re=100.0)
    assert cfg3.tau < 0.51
    # tau=0.503 is inside [0.5, 2] so no resize
    assert cfg3.with_stability_guard() is cfg3
