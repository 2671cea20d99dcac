#!/usr/bin/env python
"""Field visualizer: heatmaps, quiver and streamline plots from a checkpoint.

The TPU-native analog of the reference's offline Python visualizers
(old codes/LBM_classic/Python visualize/): reads a final_state.npz (or any
checkpoint from scripts/run_plasma.py) and renders macroscopic-field plots.

    python scripts/visualize_fields.py build/output/final_state.npz --out plots/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="field_plots")
    p.add_argument("--species", default="e,i,n")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.io import checkpoint as ckpt
    from lbm_tpu.models import plasma

    state = ckpt.load(args.checkpoint)
    NY, NX = state.Ex.shape
    cfg = PlasmaConfig(NX=NX, NY=NY)
    mac = plasma.compute_macros(cfg, state)
    os.makedirs(args.out, exist_ok=True)

    names = {"e": 0, "i": 1, "n": 2}
    for s in args.species.split(","):
        k = names[s]
        rho = np.asarray(mac.rho[k])
        ux = np.asarray(mac.ux[k])
        uy = np.asarray(mac.uy[k])

        fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
        im = ax.imshow(rho, origin="lower", cmap="viridis")
        fig.colorbar(im, ax=ax, label=f"rho_{s}")
        ax.set_title(f"density {s} (step {int(state.step)})")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"density_{s}.png"))
        plt.close(fig)

        # quiver (subsampled) + streamlines over speed heatmap
        step_q = max(1, NX // 32)
        Y, X = np.mgrid[0:NY:step_q, 0:NX:step_q]
        fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
        speed = np.sqrt(ux**2 + uy**2)
        im = ax.imshow(speed, origin="lower", cmap="magma")
        fig.colorbar(im, ax=ax, label=f"|u_{s}|")
        ax.quiver(X, Y, ux[::step_q, ::step_q], uy[::step_q, ::step_q],
                  color="w", scale_units="xy", angles="xy")
        ax.set_title(f"velocity {s}")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"velocity_{s}.png"))
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
        ax.streamplot(np.arange(NX), np.arange(NY), ux, uy,
                      color=speed, cmap="magma", density=1.2)
        ax.set_title(f"streamlines {s}")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"streamlines_{s}.png"))
        plt.close(fig)

    # charge density and field
    fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
    im = ax.imshow(np.asarray(mac.rho_q), origin="lower", cmap="RdBu_r")
    fig.colorbar(im, ax=ax, label="rho_q")
    ax.set_title("charge density")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "rho_q.png"))
    plt.close(fig)

    print(f"plots in {args.out}")


if __name__ == "__main__":
    main()
