#!/usr/bin/env python
"""In-process A/B ablation of the 3-D step at wide cross-sections.

Round-3 follow-up to VERDICT weak-#3: the y-paneled kernel brought
512^2 x NZ columns from ~87 MLUPS (jnp fallback) to ~411, but that is
still ~3.5x off the bf16 byte roofline (~456 B/site at ~670 GB/s). This
script splits the step on the real chip — loop-carried data, sync
cancelled by a long/short window difference (cf. ablate_poisson.py) — to
show where the remaining time is:

  full_step     models/plasma3d.make_step (kernel + solve + E rolls)
  kernel_only   the fused kernel the size selects (panel/split/single)
  solve_rfft    per-axis rfft/fft chain (the pre-round-3 solve)
  solve_packed  packed-halves chain (_rfft3_packed: complex passes only)
  efield_only   the 6 jnp.roll central differences
  raw_c2c_3d    full-size complex fftn+ifftn round trip (per-unit floor)

Usage: python scripts/ablate_3d.py [--nz 64 --ny 512 --nx 512]
       [--storage bf16] [--iters 20] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--ny", type=int, default=512)
    ap.add_argument("--nx", type=int, default=512)
    ap.add_argument("--storage", choices=["native", "bf16"], default="bf16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--best-of", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated variant names")
    ap.add_argument("--kernel", choices=["auto", "single", "split", "panel"],
                    default="auto", help="force a kernel for kernel_only")
    ap.add_argument("--panel", type=int, default=0,
                    help="force the panel height (panel kernel)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbm_tpu import config as C
    from lbm_tpu.models import plasma3d
    from lbm_tpu.ops.poisson import _irfft3_packed, _rfft3_packed

    NZ, NY, NX = args.nz, args.ny, args.nx
    sites = NZ * NY * NX
    cfg = C.PlasmaConfig(
        NX=NX, NY=NY, NZ=NZ, nsteps=args.iters, backend="fused",
        storage=args.storage, poisson=C.PoissonSolver.FFT, bc=C.BC.PERIODIC)
    print(f"{NZ}x{NY}x{NX} ({sites/1e6:.1f}M sites), storage={cfg.storage}, "
          f"platform={jax.devices()[0].platform}")

    short = max(args.iters // 5, 1)
    eff = args.iters - short

    def timed(name, rollout_of):
        long_f, short_f = rollout_of(args.iters), rollout_of(short)

        def trial(f, x):
            y = f(x)
            t0 = time.perf_counter()
            y = f(y)
            leaf = jax.tree_util.tree_leaves(y)[0]
            _ = float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))
            return time.perf_counter() - t0, y

        x0 = init()
        (_, x0) = trial(long_f, x0)
        (_, x0) = trial(short_f, x0)
        tl = min(trial(long_f, x0)[0] for _ in range(args.best_of))
        ts = min(trial(short_f, x0)[0] for _ in range(args.best_of))
        ms = (tl - ts) / eff * 1e3
        print(f"{name:14s} {ms:9.3f} ms/step   "
              f"({sites / (ms * 1e-3) / 1e6:8.1f} MLUPS-equiv)")
        return ms

    # --- state/rho initializers --------------------------------------------
    def init_state():
        return plasma3d.init_state(cfg)

    key = jax.random.PRNGKey(0)
    rho0 = jax.random.normal(key, (NZ, NY, NX), jnp.float32) * 1e-8

    # --- variants ----------------------------------------------------------
    step = plasma3d.make_step(cfg)

    def v_full(k):
        def roll(s):
            def body(st, _):
                return step(st), None
            return jax.lax.scan(body, s, None, length=k)[0]
        return jax.jit(roll)

    def v_kernel(k):
        u = cfg.units()
        from lbm_tpu.kernels.fused_panel3d import (collide_stream_panel3d,
                                                   pick_panel3d)
        from lbm_tpu.kernels.fused_split3d import (check_vmem_split3d,
                                                   collide_stream_split3d)
        from lbm_tpu.kernels.fused_step3d import check_vmem3d, collide_stream3d
        itemsize = 2 if cfg.storage == "bf16" else jnp.dtype(cfg.dtype).itemsize
        if args.kernel == "single":
            kern = collide_stream3d
        elif args.kernel == "split":
            kern = collide_stream_split3d
        elif args.kernel == "panel":
            import functools as _ft
            kern = _ft.partial(collide_stream_panel3d, panel=args.panel)
        else:
            try:
                check_vmem3d(NY, NX, itemsize)
                kern = collide_stream3d
            except ValueError:
                try:
                    check_vmem_split3d(NY, NX, itemsize)
                    kern = collide_stream_split3d
                except ValueError:
                    pick_panel3d(NY, NX, itemsize)
                    kern = collide_stream_panel3d
        nref = u.rho_n_init if cfg.neutral_delta else 0.0

        def roll(s):
            def body(st, _):
                f, g, _rq = kern(
                    st.f, st.g, st.Ex, st.Ey, st.Ez,
                    taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e,
                    m_i=u.m_i, cs2=u.cs2, kb=u.kb, neutral_ref=nref)
                return st._replace(f=f, g=g), None
            return jax.lax.scan(body, s, None, length=k)[0]
        return jax.jit(roll)

    def rho_rollout(op):
        def mk(k):
            def roll(r):
                def body(rr, _):
                    return op(rr), None
                return jax.lax.scan(body, r, None, length=k)[0]
            return jax.jit(roll)
        return mk

    inv = plasma3d.spectral_inv3d(NZ, NY, NX)

    def v_solve_rfft(r):
        h = jnp.fft.rfft(r, axis=-1)
        h = jnp.fft.fft(h, axis=-2)
        h = jnp.fft.fft(h, axis=-3)
        h = h * jnp.asarray(inv, h.dtype)
        h = jnp.fft.ifft(h, axis=-3)
        h = jnp.fft.ifft(h, axis=-2)
        phi = jnp.fft.irfft(h, n=NX, axis=-1)
        return r + 1e-6 * phi.astype(r.dtype)

    def v_solve_packed(r):
        h = _rfft3_packed(r)
        h = h * jnp.asarray(inv, h.dtype)
        phi = _irfft3_packed(h, s=(NZ, NY, NX))
        return r + 1e-6 * phi.astype(r.dtype)

    def v_efield(r):
        Ex, Ey, Ez = plasma3d.efield_periodic3d(r)
        return r + 1e-6 * (Ex + Ey + Ez)

    def v_raw_c2c(r):
        z = r.astype(jnp.complex64)
        for ax in (2, 1, 0):
            z = jnp.fft.fft(z, axis=ax)
        for ax in (0, 1, 2):
            z = jnp.fft.ifft(z, axis=ax)
        return r + 1e-6 * jnp.real(z)

    variants = [
        ("full_step", v_full, "state"),
        ("kernel_only", v_kernel, "state"),
        ("solve_rfft", rho_rollout(v_solve_rfft), "rho"),
        ("solve_packed", rho_rollout(v_solve_packed), "rho"),
        ("efield_only", rho_rollout(v_efield), "rho"),
        ("raw_c2c_3d", rho_rollout(v_raw_c2c), "rho"),
    ]
    names = set(args.only.split(",")) if args.only else None
    for name, mk, kind in variants:
        if names and name not in names:
            continue
        init = init_state if kind == "state" else (lambda: rho0)
        try:
            timed(name, mk)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} error: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
