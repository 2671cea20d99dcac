#!/usr/bin/env python
"""In-process A/B of the 3-D packed spectral solve's z-axis pass:
XLA's axis-0 FFT (transposes the volume twice per pass) vs the MXU DFT
matmul (_fft_axis0_mxu, no transpose, K = NZ contraction at HIGHEST).

Times the FULL solve (solve_fft3d) both ways on loop-carried data —
scan rollout, scalar-read sync, long/short-window difference, best of N.

Usage: python scripts/ablate_fft3_zpass.py [--nz 64 --ny 512 --nx 512]
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--best-of", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.models import plasma3d
    from lbm_tpu.ops import poisson

    NZ, NY, NX = args.nz, args.ny, args.nx
    print(f"{NZ}x{NY}x{NX}, platform={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    rho0 = jnp.asarray(rng.standard_normal((NZ, NY, NX)).astype(np.float32))

    def timed(name, max_n):
        poisson._DFT_MXU_MAX_N = max_n
        jax.clear_caches()

        def roll(k):
            def body(r, _):
                phi = plasma3d.solve_fft3d(r)
                # feed the output back (keeps the chain loop-carried)
                return phi + 1e-6 * r, None

            def run(r):
                r2, _ = jax.lax.scan(body, r, None, length=k)
                return r2
            return jax.jit(run)

        long_f, short_f = roll(args.iters), roll(max(args.iters // 5, 1))

        def trial(fn):
            _ = float(rho0[0, 0, 0])
            t0 = time.perf_counter()
            out = fn(rho0)
            _ = float(out[0, 0, 0])
            return time.perf_counter() - t0

        trial(long_f); trial(short_f)
        tl = min(trial(long_f) for _ in range(args.best_of))
        ts = min(trial(short_f) for _ in range(args.best_of))
        eff = args.iters - max(args.iters // 5, 1)
        ms = (tl - ts) / eff * 1e3
        print(f"{name:14s} {ms:8.3f} ms per solve")
        return ms

    orig = poisson._DFT_MXU_MAX_N
    try:
        timed("xla_zfft", 0)
        timed("mxu_zdft", 128)
    finally:
        poisson._DFT_MXU_MAX_N = orig


if __name__ == "__main__":
    main()
