#!/usr/bin/env python
"""Banded plasma temporal blocking at large grids (VERDICT r03 item 3).

Measures the NONE+periodic banded multistep kernel
(kernels/fused_multistep.collide_stream_multistep_banded, reached through
make_rollout's auto-banding dispatch) against the per-step fused kernel
IN THE SAME PROCESS at 1024^2-4096^2, where the whole-state VMEM budget
forces the band split. The golden parameters are physically unstable at
these grids (CLAUDE.md numerics rules), so every timed trial restarts
from a fresh init_state and asserts finiteness; windows are kept short.

Methodology (bench.py): long/short rollout difference cancels the
device->host sync fence and dispatch overhead. For banded rows both
rollouts use the SAME cfg.multistep=K (long = W windows, short = 1), so
the difference is exactly (W-1)*K steps of the identical kernel.

Writes reference-schema rows (io/timing.append_timing_csv) to
artifacts/scaling/scaling_plasma_multistep_large.csv and a JSON summary
next to it. Run on the real chip:  python scripts/measure_banded_plasma.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CSV = os.path.join(os.path.dirname(__file__), "..", "artifacts", "scaling",
                   "scaling_plasma_multistep_large.csv")
OUT = os.path.join(os.path.dirname(__file__), "..", "artifacts", "scaling",
                   "banded_plasma_large.json")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
    from lbm_tpu.io import timing
    from lbm_tpu.models import plasma
    from lbm_tpu.utils.watchdog import finite_reduction

    finite = jax.jit(finite_reduction)

    def timed(cfg, n_long: int, n_short: int):
        """best-of-3 differenced wall-ms for (n_long - n_short) steps."""
        roll_long = jax.jit(plasma.make_rollout(cfg, n_long),
                            donate_argnums=(0,))
        roll_short = jax.jit(plasma.make_rollout(cfg, n_short),
                             donate_argnums=(0,))

        def trial(roll):
            s = plasma.init_state(cfg)
            bool(finite(s))          # sync: state resident before t0
            t0 = time.perf_counter()
            s = roll(s)
            ok = bool(finite(s))     # device->host read = the only fence
            dt = time.perf_counter() - t0
            if not ok:
                raise FloatingPointError(
                    f"non-finite after {roll is roll_long and n_long or n_short}"
                    f" steps at {cfg.NY}x{cfg.NX} {cfg.storage}")
            return dt

        trial(roll_long)             # compile + warm
        trial(roll_short)
        t_long = min(trial(roll_long) for _ in range(3))
        t_short = min(trial(roll_short) for _ in range(3))
        dt, eff = t_long - t_short, n_long - n_short
        if dt <= 0:
            dt, eff = t_long, n_long
        return dt * 1000.0, eff

    def run(n: int, storage: str, K: int, windows: int):
        """One row. K=0 -> per-step fused baseline over `windows` steps."""
        cfg = dataclasses.replace(
            PlasmaConfig(), NX=n, NY=n, nsteps=max(windows, 1) * max(K, 1),
            dtype=jnp.float32, poisson=PoissonSolver.NONE, bc=BC.PERIODIC,
            backend="fused", storage=storage,
            neutral_delta=storage == "bf16", multistep=K)
        if K:
            wall_ms, eff = timed(cfg, windows * K, K)
        else:
            wall_ms, eff = timed(cfg, windows, max(windows // 5, 1))
        mlups = n * n * eff / wall_ms / 1000.0
        timing.append_timing_csv(
            CSV, NX=n, NY=n, nsteps=eff, n_devices=1,
            poisson=PoissonSolver.NONE.value,
            bc=BC.PERIODIC.value, wall_ms=wall_ms)
        row = dict(N=n, storage=storage, K=K, eff_steps=eff,
                   wall_ms=round(wall_ms, 3), mlups=round(mlups, 1))
        print(json.dumps(row), flush=True)
        return row

    # (N, storage, K, long-windows): K chosen from the VMEM feasibility
    # sweep (pick_multistep_bands_plasma); windows kept inside the golden
    # parameters' finite horizon (f32 ~50-100 steps at 1024^2, bf16
    # shorter; 4096^2 bf16 ~10-12 steps -> 2 windows of 8 is the probe).
    plan = [
        (1024, "native", 0, 30), (1024, "native", 8, 4),
        (1024, "native", 16, 2),
        (1024, "bf16", 0, 20), (1024, "bf16", 8, 2),
        (2048, "native", 0, 20), (2048, "native", 8, 3),
        (2048, "bf16", 0, 12), (2048, "bf16", 8, 2), (2048, "bf16", 16, 2),
        (4096, "native", 0, 14),
        (4096, "bf16", 0, 10), (4096, "bf16", 8, 2),
    ]
    only = os.environ.get("BANDED_ONLY")  # e.g. "2048:bf16" to subset
    rows = []
    for n, st, K, w in plan:
        if only and f"{n}:{st}" != only:
            continue
        try:
            rows.append(run(n, st, K, w))
        except FloatingPointError as e:   # blow-up: retry shortest window
            print(json.dumps({"N": n, "storage": st, "K": K,
                              "error": str(e)}), flush=True)
            if K and w > 2:
                try:
                    rows.append(run(n, st, K, 2))
                except Exception as e2:
                    print(json.dumps({"N": n, "storage": st, "K": K,
                                      "error": str(e2)}), flush=True)
        except Exception as e:            # infeasible band split etc.
            print(json.dumps({"N": n, "storage": st, "K": K,
                              "error": str(e)}), flush=True)
    with open(OUT, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {len(rows)} rows -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
