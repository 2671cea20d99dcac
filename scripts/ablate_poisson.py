#!/usr/bin/env python
"""In-process A/B ablation of the FFT Poisson + E path (round-3, VERDICT #1).

The full bf16 step at 2048^2 is FFT-bound: the spectral solve + E
reconstruction costs ~1.05 ms of a ~2.9 ms step and runs serially with the
fused kernel (one tensor core). This script times each candidate
decomposition on the real chip with loop-carried data (a scan whose carry
feeds the next solve — nothing constant-folds, the round-1 trap) and the
device->host sync cancelled by a long/short window difference.

Variants:
  current      solve_fft (packed rfft2 -> eigenvalue -> packed irfft2)
               + efield_periodic rolls
  solve_only   solve_fft alone (no E)
  rolls_only   efield_periodic alone
  fwd_only     packed forward transform alone
  spectral_e   k-space gradient: \\hat{E}x = -i sin(2 pi kx/NX) \\hat{phi}
               (exact central-difference symbol), Ex+iEy packed in ONE
               complex inverse FFT2, phi never materialized
  raw_c2c      full-size complex fft2+ifft2 round trip (the per-unit floor)
  real_rfft2   jnp.fft.rfft2/irfft2 direct (XLA real-FFT path) + rolls

Usage: python scripts/ablate_poisson.py [--n 2048] [--iters 50] [--cpu]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--best-of", type=int, default=3)
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

    from lbm_tpu.ops import poisson as P

    N = args.n
    key = jax.random.PRNGKey(0)
    rho0 = jax.random.normal(key, (N, N), jnp.float32) * 1e-8

    def timed(name, op):
        """op: rho -> rho' (loop-carried so nothing folds)."""
        def rollout(k):
            def body(r, _):
                return op(r), None
            return jax.jit(lambda r: jax.lax.scan(body, r, None, length=k)[0])

        long_f, short_f = rollout(args.iters), rollout(max(args.iters // 5, 1))

        def trial(f):
            r = f(rho0)
            t0 = time.perf_counter()
            r = f(r)
            _ = float(r[0, 0])   # real sync under axon
            return time.perf_counter() - t0

        trial(long_f); trial(short_f)  # compile + warm
        tl = min(trial(long_f) for _ in range(args.best_of))
        ts = min(trial(short_f) for _ in range(args.best_of))
        eff = args.iters - max(args.iters // 5, 1)
        ms = (tl - ts) / eff * 1e3
        print(f"{name:24s} {ms:8.3f} ms")
        return ms

    # each op folds its outputs back into a same-shaped real carry
    def v_current(r):
        phi = P.solve_fft(r)
        Ex, Ey = P.efield_periodic(phi)
        return r + 1e-6 * (Ex + Ey)

    def v_solve_only(r):
        return r + 1e-6 * P.solve_fft(r)

    def v_rolls_only(r):
        Ex, Ey = P.efield_periodic(r)
        return r + 1e-6 * (Ex + Ey)

    def v_fwd_only(r):
        h = P._rfft2_packed(r)
        return r + 1e-6 * jnp.real(h[:, : N // 2 + 1])[:, :1] * 0 + r * 1e-30 \
            + 1e-6 * jnp.pad(jnp.real(h), ((0, 0), (0, N - h.shape[1])))

    def v_spectral_e(r):
        Ex, Ey = P.solve_fft_efield(r)
        return r + 1e-6 * (Ex + Ey)

    def v_raw_c2c(r):
        z = jnp.fft.ifft2(jnp.fft.fft2(r))
        return r + 1e-6 * jnp.real(z)

    def v_real_rfft2(r):
        h = jnp.fft.rfft2(r)
        phi = jnp.fft.irfft2(h, s=(N, N))
        Ex, Ey = P.efield_periodic(phi)
        return r + 1e-6 * (Ex + Ey)

    variants = [("current", v_current), ("solve_only", v_solve_only),
                ("rolls_only", v_rolls_only), ("fwd_only", v_fwd_only),
                ("raw_c2c", v_raw_c2c), ("real_rfft2", v_real_rfft2)]
    if hasattr(P, "solve_fft_efield"):
        variants.insert(5, ("spectral_e", v_spectral_e))
    print(f"N={N}, iters={args.iters}, platform="
          f"{jax.devices()[0].platform}")
    for name, op in variants:
        try:
            timed(name, op)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} error: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
