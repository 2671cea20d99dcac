#!/usr/bin/env python
"""Same-process v5e A/B: VMEM-resident iterative-solve kernel vs the
jnp (XLA roll-sweep) path — VERDICT-style measured evidence for the
iter_engine='auto' policy (kernels/poisson_iter.py).

Two measurements per (grid, solver):
  1. solve-only: one warm-started solve on a fixed (phi0, rho_q) with
     tol=0 and a FIXED iteration count (100 sweeps — the reference's
     GS workloads run hundreds; fixed count makes the A/B exact).
  2. full-step MLUPS: the fused plasma step at golden parameters with
     iter_engine='xla' vs 'pallas' (default tol/max_iter; warm-started
     phi makes the per-step sweep count identical between engines, so
     this is the end-to-end view of the same delta). Short finite
     windows (golden parameters are unstable at these grids).

Prints one JSON line per row; appends nothing (results go to the
STATUS ledger by hand). Run: python scripts/measure_poisson_iter.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GRIDS = [int(g) for g in
         os.environ.get("MPI_GRIDS", "256,512,1024").split(",")]
ITERS = int(os.environ.get("MPI_ITERS", "100"))
STEPS = int(os.environ.get("MPI_STEPS", "12"))
BEST_OF = int(os.environ.get("MPI_BEST_OF", "3"))
SOLVE_ONLY = bool(int(os.environ.get("MPI_SOLVE_ONLY", "0")))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
    from lbm_tpu.kernels import poisson_iter
    from lbm_tpu.models import plasma
    from lbm_tpu.ops import poisson as P
    from lbm_tpu.utils.watchdog import finite_reduction

    finite = jax.jit(finite_reduction)

    def sync(x):
        return float(jnp.ravel(x)[0])  # device->host read = the only fence

    def best(fn, n=BEST_OF):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for N in GRIDS:
        rng = np.random.default_rng(7)
        rho = jnp.asarray(0.1 * rng.random((N, N)), jnp.float32)
        rho = rho - rho.mean()
        phi0 = jnp.asarray(0.05 * rng.random((N, N)), jnp.float32)

        spec = ("gs", None, ITERS, 0.0, False)
        k_solve = jax.jit(lambda p, r: poisson_iter.solve_iter_tpu(
            p, r, spec=spec))
        j_solve = jax.jit(lambda p, r: P.solve_gs(
            p, r, periodic=True, max_iter=ITERS, tol=0.0))
        a = k_solve(phi0, rho); sync(a)
        b = j_solve(phi0, rho); sync(b)
        drift = float(jnp.abs(a - b).max() / jnp.abs(b).max())
        # the ~30 ms tunnel sync would swamp a single solve — chain REPS
        # warm-started solves in one dispatch so the sync amortizes out
        REPS = int(os.environ.get("MPI_REPS", "50"))

        def chain(solve):
            def body(p, _):
                return solve(p, rho), None
            return jax.jit(lambda p: jax.lax.scan(body, p, None,
                                                  length=REPS)[0])
        kc, jc = chain(k_solve), chain(j_solve)
        sync(kc(phi0)); sync(jc(phi0))  # compile+warm
        t_k = best(lambda: sync(kc(phi0))) / REPS
        t_j = best(lambda: sync(jc(phi0))) / REPS
        print(json.dumps({
            "leg": "solve_only_gs", "grid": N, "iters": ITERS,
            "reps": REPS,
            "kernel_ms": round(t_k * 1e3, 3), "xla_ms": round(t_j * 1e3, 3),
            "speedup": round(t_j / t_k, 2), "rel_drift": drift,
        }), flush=True)

        if SOLVE_ONLY:
            continue
        solvers = [PoissonSolver[s] for s in os.environ.get(
            "MPI_SOLVERS", "GS,SOR,NPS").split(",")]
        for sol in solvers:
            row = {"leg": f"step_{sol.name.lower()}", "grid": N,
                   "steps": STEPS}
            for eng in ("xla", "pallas"):
                cfg = dataclasses.replace(
                    PlasmaConfig(), NX=N, NY=N, nsteps=STEPS,
                    dtype=jnp.float32, poisson=sol, bc=BC.PERIODIC,
                    backend="fused", iter_engine=eng)
                roll = jax.jit(plasma.make_rollout(cfg, STEPS))
                s0 = plasma.init_state(cfg)
                sync(s0.f[0])
                out = roll(s0)
                ok = bool(finite(out))
                t = best(lambda: sync(roll(s0).f[0]))
                row[f"{eng}_ms_per_step"] = round(t * 1e3 / STEPS, 3)
                row[f"{eng}_finite"] = ok
            row["mlups_xla"] = round(N * N * 1e-3 / row["xla_ms_per_step"], 1)
            row["mlups_pallas"] = round(
                N * N * 1e-3 / row["pallas_ms_per_step"], 1)
            row["speedup"] = round(
                row["xla_ms_per_step"] / row["pallas_ms_per_step"], 2)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
