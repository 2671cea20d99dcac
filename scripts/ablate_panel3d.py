#!/usr/bin/env python
"""Internal ablation of the y-paneled 3-D kernel (kernel-only timings).

Round-3 ablation ledger (512^2 x 64 bf16, DMA floor ~11.4 ms): v2 (exact
panel collide + XLA edge fixups) measured baseline 19.3 / nofix 16.8 /
skeleton 14.7 / noroll 14.7 — i.e. the XLA fixup pass cost 2.5 ms, the
physics 2.1 ms, rolls were free. v3 (1-row in-kernel halo collide +
where-selects) removes the fixup and the packed-export concat. Variants:

  baseline   the real kernel (panel + halo collide, rolls, z-pipeline)
  skeleton   macros/equilibria/collide stubbed to pass-throughs: what the
             DMA + in-VMEM plane traffic (rolls, scratch shuffles,
             assembly) costs by itself
  noroll     skeleton with the (y, x) value rolls also removed

All variants run kernel-only scan rollouts on loop-carried data, sync by
scalar read, long/short-window difference, best of N — in ONE process
(chip speed varies session to session; only in-process A/B is valid).

Usage: python scripts/ablate_panel3d.py [--nz 64 --ny 512 --nx 512]
       [--storage bf16] [--panel 0] [--variants baseline,skeleton,...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--ny", type=int, default=512)
    ap.add_argument("--nx", type=int, default=512)
    ap.add_argument("--storage", choices=["native", "bf16"], default="bf16")
    ap.add_argument("--panel", type=int, default=0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--best-of", type=int, default=3)
    ap.add_argument("--variants", type=str,
                    default="baseline,skeleton,noroll")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbm_tpu import config as C
    from lbm_tpu.kernels import fused_panel3d as FP
    from lbm_tpu.models import plasma3d

    NZ, NY, NX = args.nz, args.ny, args.nx
    sites = NZ * NY * NX
    cfg = C.PlasmaConfig(
        NX=NX, NY=NY, NZ=NZ, nsteps=args.iters, backend="fused",
        storage=args.storage, poisson=C.PoissonSolver.FFT, bc=C.BC.PERIODIC)
    u = cfg.units()
    nref = u.rho_n_init if cfg.neutral_delta else 0.0
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb, neutral_ref=nref, panel=args.panel)
    print(f"{NZ}x{NY}x{NX} ({sites/1e6:.1f}M sites), storage={cfg.storage}, "
          f"platform={jax.devices()[0].platform}")

    orig = dict(update_macro3=FP.update_macro3,
                equilibrium_wpolys3=FP.equilibrium_wpolys3,
                collide_species_dirs3=FP.collide_species_dirs3,
                _roll2=FP._roll2)

    def macro_stub(fsl, gsl, Ex, Ey, Ez, **kw):
        return SimpleNamespace(rho_q=fsl[0][0],
                               ux_pair=(Ex, Ex, Ex), uy_pair=(Ey, Ey, Ey),
                               uz_pair=(Ez, Ez, Ez))

    def collide_stub(s, fsl_s, gsl_s, mac, *a, **kw):
        return list(fsl_s), list(gsl_s)

    def apply(name):
        for k, v in orig.items():
            setattr(FP, k, v)
        if name in ("skeleton", "noroll"):
            FP.update_macro3 = macro_stub
            FP.equilibrium_wpolys3 = lambda *a, **k: None
            FP.collide_species_dirs3 = collide_stub
        if name == "noroll":
            FP._roll2 = lambda a, cy, cx: a

    def timed(name):
        apply(name)
        jax.clear_caches()

        def roll(k):
            def body(carry, _):
                f, g = carry
                f2, g2, rq = FP.collide_stream_panel3d(
                    f, g, s0.Ex, s0.Ey, s0.Ez, **phys)
                return (f2, g2), None

            def run(f, g):
                (f2, g2), _ = jax.lax.scan(body, (f, g), None, length=k)
                return f2, g2
            return jax.jit(run, donate_argnums=(0, 1))

        long_f = roll(args.iters)
        short_f = roll(max(args.iters // 5, 1))

        def trial(fn):
            st = plasma3d.init_state(cfg)
            _ = float(jnp.asarray(st.f[0, 0, 0, 0, 0], jnp.float32))
            t0 = time.perf_counter()
            f, g = fn(st.f, st.g)
            _ = float(jnp.asarray(f[0, 0, 0, 0, 0], jnp.float32))
            return time.perf_counter() - t0

        trial(long_f); trial(short_f)
        tl = min(trial(long_f) for _ in range(args.best_of))
        ts = min(trial(short_f) for _ in range(args.best_of))
        eff = args.iters - max(args.iters // 5, 1)
        ms = (tl - ts) / eff * 1e3
        print(f"{name:10s} {ms:8.3f} ms kernel-only "
              f"({sites / (ms * 1e-3) / 1e6:7.1f} MLUPS)")
        return ms

    s0 = plasma3d.init_state(cfg)
    try:
        for name in args.variants.split(","):
            try:
                timed(name)
            except Exception as e:  # noqa: BLE001
                print(f"{name:10s} error: {type(e).__name__}: {e}")
    finally:
        for k, v in orig.items():
            setattr(FP, k, v)


if __name__ == "__main__":
    main()
