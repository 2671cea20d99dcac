#!/usr/bin/env python
"""Hardware compile/run check for the GATED plasma multistep kernel.

The gated kernel (kernels/fused_multistep.collide_stream_multistep_gated,
reached through make_rollout's banded dispatch for bounce-back configs
past the whole-state VMEM budget) is exercised in-tree only in interpret
mode on CPU meshes; this script confirms it compiles and runs NON-interpret
on the real chip (advisor round-3 follow-up: Mosaic's sublane-alignment
rules differ between interpret and hardware).

Two legs, both short finite windows (golden parameters are unstable at
these grids, CLAUDE.md):
  1. 1024^2 NONE + BOUNCE_BACK, multistep K=8  -> banded GATED kernel
     (wall rows traced onto the first/last band).
  2. same config through the per-step fused path for a plausibility
     cross-check of the kernel's output statistics (NOT bitwise: banded
     windows reorder the E-kill vs per-step dispatch identically, so
     rho/T ranges should agree to bf16/f32 noise over one window).

Prints one JSON line per leg; exits nonzero on compile failure or
non-finite output. Run:  python scripts/check_gated_tpu.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
    from lbm_tpu.models import plasma
    from lbm_tpu.utils.watchdog import finite_reduction

    finite = jax.jit(finite_reduction)
    N, K, windows = 1024, 8, 2

    def run(multistep: int) -> dict:
        cfg = dataclasses.replace(
            PlasmaConfig(), NX=N, NY=N, nsteps=windows * K,
            dtype=jnp.float32, poisson=PoissonSolver.NONE,
            bc=BC.BOUNCE_BACK, backend="fused", multistep=multistep)
        roll = jax.jit(plasma.make_rollout(cfg, windows * K))
        s = plasma.init_state(cfg)
        bool(finite(s))
        t0 = time.perf_counter()
        out = roll(s)
        ok = bool(finite(out))
        dt = time.perf_counter() - t0
        r = jnp.stack([out.f[0].sum(0), out.f[1].sum(0), out.f[2].sum(0)])
        row = {
            "leg": f"multistep={multistep}", "grid": N, "steps": windows * K,
            "finite": ok, "wall_ms_first_call": round(dt * 1000, 1),
            "rho_min": float(r.min()), "rho_max": float(r.max()),
        }
        print(json.dumps(row), flush=True)
        if not ok:
            raise SystemExit(f"non-finite output in leg multistep={multistep}")
        return row

    gated = run(K)        # banded -> GATED kernel on hardware
    perstep = run(0)      # per-step fused cross-check
    # plausibility: both runs should land in the same macroscopic range
    lo = min(perstep["rho_min"], gated["rho_min"])
    hi = max(perstep["rho_max"], gated["rho_max"])
    span = hi - lo if hi > lo else 1.0
    drift = max(abs(gated["rho_min"] - perstep["rho_min"]),
                abs(gated["rho_max"] - perstep["rho_max"])) / span
    print(json.dumps({"rho_range_rel_drift": round(drift, 6),
                      "pass": drift < 1e-3}), flush=True)
    return 0 if drift < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
