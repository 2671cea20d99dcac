#!/usr/bin/env python
"""Kernel-only ablation of the bf16 fused step's exposed VPU compute.

Round-2 measured (2048^2 bf16): kernel 1.96-2.05 ms vs a 1.48 ms DMA+macros
floor; ablated split tm ~0.38 ms, geqd ~0.10, f-side ~0.04. This script
re-measures that split in the current session (chip bandwidth varies with
pool contention — A/B in-process only) and times the round-3 candidates:

  baseline     the PRODUCTION path (collide_species_dirs_fused_fast:
               one-loop charged pairs with shared products + skip_r0)
  shim_base    the classic two-loop f+g pair path the patched variants
               run through (fused_fast_shim with the UNPATCHED g math).
               Variant deltas must be taken against THIS, not baseline —
               the shim's structure differs from the production one-loop
               path, so baseline-relative deltas would mix in the shim
               overhead itself
  no_tm        energy-loss term deleted (NOT physics — floor probe)
  no_geqd      thermal equilibria deleted (floor probe)
  skip_r0      exact: drop pair terms whose C_p is identically 0 because
               tau = 1 (r = 0) — the neutral self pair at the golden taus
  tm_bf16      evaluate the tm reciprocal chain in bfloat16 (2x VPU rate;
               error enters only through the small dT source term)
  g_bf16       evaluate the entire g-side (geqd + tm + blend) in bfloat16

Each variant monkeypatches lbm_tpu.ops.collide and re-traces (caches
cleared). Timing: kernel-only scan rollout, long/short difference, sync by
scalar read, best of N.

Usage: python scripts/ablate_bf16_kernel.py [--n 2048] [--iters 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_variant(name):
    """Return a replacement for collide_species_g_dirs_fast."""
    import jax.numpy as jnp

    from lbm_tpu.ops import collide as C
    from lbm_tpu.ops.macros import _c

    _Q = C._Q

    def fast(s, g_s, mac, *, taus, cs2, kb, recip,
             pair_polys=None, self_wpolys=None):
        t_self, invs, wp, keep = C._species_setup(
            s, mac, cs2, taus, pair_polys, self_wpolys)
        rho_s, ux_s, uy_s, T_s = mac.rho[s], mac.ux[s], mac.uy[s], mac.T[s]
        amp_f = tuple(rho_s * inv for inv in invs)

        cs, offs = [], []
        for inv in invs:
            r = 1.0 - inv
            cs.append(rho_s * (r * r - r) + r)
            offs.append(2.0 * r)
        u2 = ux_s * ux_s + uy_s * uy_s
        dT_amp = -(rho_s * u2) / kb
        ratio_q = (T_s * recip(jnp.where(rho_s == 0.0, _c(1.0, rho_s),
                                         rho_s))) * (1.0 / _Q)

        active = [p for p in range(3)
                  if not (name == "skip_r0" and (1.0 - invs[p]) == 0.0)]
        lp = jnp.bfloat16 if name in ("tm_bf16", "g_bf16") else None
        if lp is not None:
            cs_l = [c.astype(lp) for c in cs]
            dT_amp_l = dT_amp.astype(lp)
            recip_f32 = recip
            recip = lambda x: recip_f32(x.astype(jnp.float32)).astype(lp)  # noqa: E731

        g_dirs = []
        for i in range(_Q):
            qf = [_Q * (amp_f[p] * wp[p][i]) for p in range(3)]
            geqd = (jnp.zeros_like(rho_s) if name == "no_geqd"
                    else ratio_q * (qf[0] + qf[1] + qf[2]))
            if name == "no_tm":
                g_dirs.append(g_s[i] * keep + geqd)
                continue
            if lp is not None:
                tm = jnp.asarray(-0.5 * len(active), lp)
                for p in active:
                    tm = tm + cs_l[p] * recip(
                        qf[p].astype(lp) + jnp.asarray(offs[p], lp))
                tm = tm + jnp.asarray(-0.5 * (3 - len(active)), lp)
                src = (dT_amp_l * tm).astype(qf[0].dtype)
                if name == "g_bf16":
                    g_dirs.append((g_s[i].astype(lp) * jnp.asarray(keep, lp)
                                   + geqd.astype(lp)
                                   + dT_amp_l * tm).astype(qf[0].dtype))
                else:
                    g_dirs.append(g_s[i] * keep + geqd + src)
                continue
            tm = -0.5 * len(active) - 0.5 * (3 - len(active))
            for p in active:
                tm = tm + cs[p] * recip(qf[p] + offs[p])
            g_dirs.append(g_s[i] * keep + geqd + dT_amp * tm)
        return g_dirs

    return fast


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--best-of", type=int, default=3)
    ap.add_argument("--variants", type=str,
                    default="baseline,shim_base,no_tm,no_geqd,skip_r0,"
                            "tm_bf16,g_bf16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.kernels import fused_step
    from lbm_tpu.models import plasma
    from lbm_tpu.ops import collide as C

    import dataclasses
    N = args.n
    cfg = dataclasses.replace(PlasmaConfig(), NX=N, NY=N, nsteps=1,
                              dtype=jnp.float32, backend="fused",
                              storage="bf16", neutral_delta=True)
    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb, neutral_ref=u.rho_n_init)
    s0 = plasma.init_state(cfg)
    orig = C.collide_species_g_dirs_fast

    orig_cast = fused_step._cast_io
    orig_recip = fused_step._g_recip_for
    orig_fused_fast = C.collide_species_dirs_fused_fast

    def fused_fast_shim(s, f_s, g_s, mac, Ex, Ey, *, taus, q_e, q_i, m_e,
                        m_i, cs2, kb, recip, pair_polys=None,
                        self_wpolys=None, neutral_ref=0.0):
        """Route charged species through the classic f+g pair so the
        patched collide_species_g_dirs_fast governs ALL species (the
        default path inlines the g math for s=0,1 in
        collide_species_dirs_fused_fast, which would dodge the patch)."""
        f_dirs = C.collide_species_f_dirs(
            s, f_s, mac, Ex, Ey, taus=taus, q_e=q_e, q_i=q_i, m_e=m_e,
            m_i=m_i, cs2=cs2, pair_polys=pair_polys,
            self_wpolys=self_wpolys, neutral_ref=neutral_ref)
        g_dirs = C.collide_species_g_dirs_fast(
            s, g_s, mac, taus=taus, cs2=cs2, kb=kb, recip=recip,
            pair_polys=pair_polys, self_wpolys=self_wpolys)
        return f_dirs, g_dirs

    def timed(name):
        C.collide_species_g_dirs_fast = orig
        C.collide_species_dirs_fused_fast = orig_fused_fast
        fused_step._cast_io = orig_cast
        fused_step._g_recip_for = orig_recip
        if name == "probe_allbf16":
            # THROUGHPUT PROBE ONLY (accuracy meaningless): keep all
            # collide arithmetic in bf16 to test whether the VPU runs
            # packed bf16 at 2x — recip still f32 (hardware limitation)
            fused_step._cast_io = lambda f, g: (f, g, jnp.bfloat16)
            fused_step._g_recip_for = lambda dt: (
                lambda x: fused_step.pl.reciprocal(
                    x.astype(jnp.float32), approx=True).astype(x.dtype))
        elif name == "shim_base":
            # unpatched g math through the same shim the variants use —
            # the correct reference point for variant deltas
            C.collide_species_dirs_fused_fast = fused_fast_shim
        elif name != "baseline":
            C.collide_species_g_dirs_fast = make_variant(name)
            C.collide_species_dirs_fused_fast = fused_fast_shim
        jax.clear_caches()

        def roll(k):
            def body(carry, _):
                f, g = carry
                f2, g2, rq = fused_step.collide_stream(
                    f, g, s0.Ex, s0.Ey, **phys)
                return (f2, g2), None

            def run(f, g):
                (f2, g2), _ = jax.lax.scan(body, (f, g), None, length=k)
                return f2, g2
            return jax.jit(run, donate_argnums=(0, 1))

        long_f = roll(args.iters)
        short_f = roll(max(args.iters // 5, 1))

        def trial(fn):
            # fresh state every trial: the buffers are donated, and timed
            # windows must all start from the same (finite) state
            st = plasma.init_state(cfg)
            _ = float(jnp.asarray(st.f[0, 0, 0, 0], jnp.float32))
            t0 = time.perf_counter()
            f, g = fn(st.f, st.g)
            _ = float(jnp.asarray(f[0, 0, 0, 0], jnp.float32))
            return time.perf_counter() - t0

        trial(long_f); trial(short_f)
        tl = min(trial(long_f) for _ in range(args.best_of))
        ts = min(trial(short_f) for _ in range(args.best_of))
        eff = args.iters - max(args.iters // 5, 1)
        ms = (tl - ts) / eff * 1e3
        mlups = N * N / ms / 1e3
        print(f"{name:10s} {ms:7.3f} ms kernel-only  ({mlups:7.1f} MLUPS)")
        return ms

    print(f"N={N} bf16 kernel-only, iters={args.iters}")
    try:
        for name in args.variants.split(","):
            try:
                timed(name)
            except Exception as e:  # noqa: BLE001
                print(f"{name:10s} error: {type(e).__name__}: {e}")
    finally:
        C.collide_species_g_dirs_fast = orig
        C.collide_species_dirs_fused_fast = orig_fused_fast
        fused_step._cast_io = orig_cast
        fused_step._g_recip_for = orig_recip


if __name__ == "__main__":
    main()
