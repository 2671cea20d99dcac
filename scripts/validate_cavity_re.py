#!/usr/bin/env python
"""Cavity validation across Reynolds numbers against Ghia et al. (1982).

The reference validates the cavity at Re=100 only (its course mandate,
Papers/AMSC_LBM_hands_on_proposal.pdf p.1). Ghia's paper tabulates the
centerline profiles for Re=400 and Re=1000 as well; with the fused TPU
kernel a steady-state run costs seconds, so the full sweep is cheap.
Runs each Re to steady state (velocity-field residual below --tol between
consecutive probe windows), interpolates the centerlines onto Ghia's
probe points, and writes plots + a JSON error summary to --out.

    python scripts/validate_cavity_re.py --nx 256 --out artifacts/cavity_re

Tables: Ghia, Ghia & Shin, J. Comput. Phys. 48 (1982), Tables I and II
(u through the vertical centerline / v through the horizontal one),
129x129-grid multigrid solution, transcribed from the paper's own OCR
text layer (reference: Papers/Ghia1982.pdf). Re=100 columns live in
lbm_tpu/models/cavity.py; the 400/1000 columns are here.

Known misprint: the printed Re=400 v value at x=0.9063 (-0.23827) is
nearly identical to its x=0.9453 neighbor (-0.22847) while every other
Re column changes steeply across that gap. Grid-converged runs here
(256^2 and 512^2 agree to <0.2% of u_lid) give -0.390 at x=0.9063 and
match the printed table to <1.3% of u_lid at EVERY other station, so the
printed 0.9063 entry is treated as a misprint: the summary reports the
Re=400 v error with and without that station.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Ghia Table I: u through the vertical centerline (same y stations as the
# Re=100 column in models/cavity.py).
GHIA_U = {
    400: np.array([
        0.00000, -0.08186, -0.09266, -0.10338, -0.14612, -0.24299,
        -0.32726, -0.17119, -0.11477, 0.02135, 0.16256, 0.29093,
        0.55892, 0.61756, 0.68439, 0.75837, 1.00000,
    ]),
    1000: np.array([
        0.00000, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289,
        -0.27805, -0.10648, -0.06080, 0.05702, 0.18719, 0.33304,
        0.46604, 0.51117, 0.57492, 0.65928, 1.00000,
    ]),
}
# Stations excluded from the headline error (suspected misprints — see
# module docstring): (Re, axis, station value).
SUSPECT = {(400, "v", 0.9063)}

# Ghia Table II: v through the horizontal centerline.
GHIA_V = {
    400: np.array([
        0.00000, 0.18360, 0.19713, 0.20920, 0.22965, 0.28124,
        0.30203, 0.30174, 0.05186, -0.38598, -0.44993, -0.23827,
        -0.22847, -0.19254, -0.15663, -0.12146, 0.00000,
    ]),
    1000: np.array([
        0.00000, 0.27485, 0.29012, 0.30353, 0.32627, 0.37095,
        0.33075, 0.32235, 0.02526, -0.31966, -0.42665, -0.51550,
        -0.39188, -0.33714, -0.27669, -0.21388, 0.00000,
    ]),
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nx", type=int, default=256,
                   help="grid (multiple of 8 for the fused kernel)")
    p.add_argument("--re", default="100,400,1000")
    p.add_argument("--u-lid", type=float, default=0.1)
    p.add_argument("--max-steps", type=int, default=1_500_000)
    p.add_argument("--chunk", type=int, default=20_000)
    p.add_argument("--tol", type=float, default=5e-5,
                   help="steady-state gate: max|du| between chunks, in lid "
                        "units (the f32 steady state floors at ~3e-5)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--backend", choices=("jnp", "fused"), default="fused")
    p.add_argument("--multistep", type=int, default=0, metavar="K",
                   help="temporal blocking: K steps per kernel launch "
                        "(VMEM-resident grids <=~512^2; 20-35 GLUPS — the "
                        "whole sweep in seconds; f32 trajectories equal "
                        "the banded kernels' to fusion ulp)")
    p.add_argument("--out", default="artifacts/cavity_re")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity

    backend = args.backend
    if backend == "fused" and (args.cpu
                               or (args.nx % 8 and not args.multistep)):
        # the BANDED kernel needs NY % 8 (ref-slice alignment); the
        # multistep kernel is whole-plane ops and takes any grid
        backend = "jnp"
    os.makedirs(args.out, exist_ok=True)
    summary = {}

    for re_n in (int(r) for r in args.re.split(",")):
        cfg = CavityConfig(NX=args.nx, NY=args.nx, u_lid=args.u_lid,
                           Re=float(re_n), nsteps=0, backend=backend,
                           multistep=(args.multistep
                                      if backend == "fused" else 0))
        if not 0.5 < cfg.tau < 2.0:
            raise SystemExit(f"Re={re_n}: tau={cfg.tau:.4f} outside the "
                             f"stable BGK window at {args.nx}^2 — change "
                             f"--nx or --u-lid")
        roll = jax.jit(cavity.make_rollout(cfg, args.chunk))
        s = cavity.init_state(cfg)
        prev_u = None
        resid = float("inf")
        done = 0
        while done < args.max_steps:
            s = roll(s)
            done += args.chunk
            u = np.asarray(s.ux, np.float64)
            if prev_u is not None:
                resid = np.abs(u - prev_u).max() / cfg.u_lid
                if resid < args.tol:
                    break
            prev_u = u
        print(f"Re={re_n}: steady after {done} steps "
              f"(residual {resid:.2e})", flush=True)

        (yp, up), (xp, vp) = cavity.centerline_profiles(s, cfg.u_lid)
        if re_n == 100:
            gy, gu = cavity.GHIA_Y, cavity.GHIA_U_RE100
            gx, gv = cavity.GHIA_X, cavity.GHIA_V_RE100
        else:
            gy, gu = cavity.GHIA_Y, GHIA_U[re_n]
            gx, gv = cavity.GHIA_X, GHIA_V[re_n]
        eu = np.abs(np.interp(gy, yp, up) - gu)
        ev = np.abs(np.interp(gx, xp, vp) - gv)
        keep = np.array([(re_n, "v", float(x)) not in SUSPECT for x in gx])
        summary[re_n] = {
            "steps": done, "residual": float(resid),
            "u_max_err": float(eu.max()),
            "u_rms_err": float(np.sqrt((eu ** 2).mean())),
            "v_max_err": float(ev.max()),
            "v_rms_err": float(np.sqrt((ev ** 2).mean())),
            "v_max_err_excl_misprints": float(ev[keep].max()),
            "stations": [
                {"axis": "u", "pos": float(y), "ghia": float(g),
                 "sim": float(si), "err": float(e)}
                for y, g, si, e in zip(gy, gu, np.interp(gy, yp, up), eu)
            ] + [
                {"axis": "v", "pos": float(x), "ghia": float(g),
                 "sim": float(si), "err": float(e),
                 "suspect_misprint": bool(not k)}
                for x, g, si, e, k in zip(gx, gv, np.interp(gx, xp, vp),
                                          ev, keep)
            ],
        }
        print(f"  u max={eu.max():.4f} rms={np.sqrt((eu**2).mean()):.4f}  "
              f"v max={ev.max():.4f} (excl misprints "
              f"{ev[keep].max():.4f}) rms={np.sqrt((ev**2).mean()):.4f}",
              flush=True)

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4.2), dpi=110)
        a1.plot(up, yp, "-", label=f"lbm_tpu {args.nx}^2")
        a1.plot(gu, gy, "ko", ms=4, label="Ghia 1982")
        a1.set_xlabel("u/u_lid"), a1.set_ylabel("y"), a1.legend()
        a1.set_title(f"Re={re_n}: u on x-centerline")
        a2.plot(xp, vp, "-", label=f"lbm_tpu {args.nx}^2")
        a2.plot(gx, gv, "ko", ms=4, label="Ghia 1982")
        a2.set_xlabel("x"), a2.set_ylabel("v/u_lid"), a2.legend()
        a2.set_title(f"Re={re_n}: v on y-centerline")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"ghia_re{re_n}.png"))
        plt.close(fig)

    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump({"grid": args.nx, "u_lid": args.u_lid,
                   "backend": backend, "errors_vs_ghia": summary}, fh,
                  indent=2)
    print(f"wrote {args.out}/summary.json + {len(summary)} plots")


if __name__ == "__main__":
    main()
