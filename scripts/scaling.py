#!/usr/bin/env python
"""Scalability harness: run timing sweeps and render scaling plots.

The reference accumulates (grid, steps, cores, poisson, bc, wall-ms) rows in
a CSV and post-processes them into strong/weak/grid-impact plots
(build/Scalability_analysis.py, build/weak_scalability.py). Same here, with
"cores" carrying the JAX device count:

    python scripts/scaling.py run  --grids 128,256,512,1024 --steps 50
    python scripts/scaling.py run  --solvers NONE,FFT,GS,SOR,NPS --grids 128
    python scripts/scaling.py plot --csv build/output/scaling.csv
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CSV_DEFAULT = "build/output/scaling.csv"


def cmd_run(args):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbm_tpu import config as C
    from lbm_tpu.io import timing
    from lbm_tpu.models import plasma

    grids = [int(g) for g in args.grids.split(",")]
    solvers = [C.PoissonSolver[s] for s in args.solvers.split(",")]
    n_dev = len(jax.devices())

    for n in grids:
        for sol in solvers:
            cfg = dataclasses.replace(
                C.PlasmaConfig(), NX=n, NY=n, nsteps=args.steps,
                poisson=sol, dtype=jnp.float32, backend=args.backend,
                poisson_max_iter=args.poisson_iters)
            state = plasma.init_state(cfg)
            step = jax.jit(plasma.make_step(cfg), donate_argnums=(0,))
            state = step(state)                    # compile
            float(state.f[0, 0, 0, 0])             # sync
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state = step(state)
            float(state.f[0, 0, 0, 0])
            wall_ms = (time.perf_counter() - t0) * 1000
            mlups = n * n * args.steps / wall_ms / 1000
            timing.append_timing_csv(
                args.csv, NX=n, NY=n, nsteps=args.steps, n_devices=n_dev,
                poisson=sol.value, bc=cfg.bc.value, wall_ms=wall_ms)
            print(f"{n}x{n} {sol.name:4s}: {wall_ms:8.1f} ms "
                  f"({mlups:8.1f} MLUPS)", flush=True)


def cmd_plot(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = []
    with open(args.csv) as f:
        next(f)
        for line in f:
            grid, steps, cores, poisson, bc, ms = line.strip().split(",")
            n = int(grid.split("x")[0])
            rows.append((n, int(steps), int(cores), int(poisson),
                         int(bc), float(ms)))
    rows = np.array(rows)
    out_dir = os.path.dirname(args.csv) or "."
    solver_names = {0: "NONE", 1: "GS", 2: "SOR", 3: "FFT", 4: "NPS"}

    # grid-size impact per solver (reference: "Grid size impact" plots)
    fig, ax = plt.subplots(figsize=(7, 5), dpi=110)
    for pv in sorted(set(rows[:, 3].astype(int))):
        sel = rows[rows[:, 3] == pv]
        if not len(sel):
            continue
        order = np.argsort(sel[:, 0])
        n = sel[order, 0]
        mlups = n * n * sel[order, 1] / sel[order, 5] / 1000
        ax.plot(n, mlups, "o-", label=solver_names.get(pv, str(pv)))
    ax.set_xscale("log", base=2)
    ax.set_xlabel("grid size N (NxN)")
    ax.set_ylabel("MLUPS")
    ax.set_title("Grid-size scaling by Poisson solver")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "scaling_grid_mlups.png"))

    # wall time vs grid
    fig, ax = plt.subplots(figsize=(7, 5), dpi=110)
    for pv in sorted(set(rows[:, 3].astype(int))):
        sel = rows[rows[:, 3] == pv]
        order = np.argsort(sel[:, 0])
        ax.plot(sel[order, 0], sel[order, 5] / sel[order, 1], "o-",
                label=solver_names.get(pv, str(pv)))
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("grid size N")
    ax.set_ylabel("ms / step")
    ax.set_title("Per-step wall time")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "scaling_grid_time.png"))
    print(f"plots written to {out_dir}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--grids", default="128,256,512,1024")
    r.add_argument("--solvers", default="FFT")
    r.add_argument("--steps", type=int, default=50)
    r.add_argument("--backend", default="fused")
    r.add_argument("--poisson-iters", type=int, default=100)
    r.add_argument("--csv", default=CSV_DEFAULT)
    r.set_defaults(fn=cmd_run)
    pl = sub.add_parser("plot")
    pl.add_argument("--csv", default=CSV_DEFAULT)
    pl.set_defaults(fn=cmd_plot)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
