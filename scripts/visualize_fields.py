#!/usr/bin/env python
"""Field visualizer: heatmaps, quiver and streamline plots from a checkpoint.

The TPU-native analog of the reference's offline Python visualizers
(old codes/LBM_classic/Python visualize/): reads a final_state.npz (or any
checkpoint from scripts/run_plasma.py / run_plasma3d.py) and renders
macroscopic-field plots. 3-D checkpoints are plotted at a z-slice
(--z-slice, default the midplane). The checkpoint's layout metadata
(neutral_delta / storage) is honored, so delta-stored neutrals plot as
full densities and bf16 populations are upcast before the moment sums.

    python scripts/visualize_fields.py build/output/final_state.npz --out plots/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_macros(path: str, z_slice: int | None):
    """(rho[s], ux[s], uy[s], rho_q, step) as 2-D numpy arrays."""
    import dataclasses

    import numpy as np

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.io import checkpoint as ckpt

    meta = ckpt.load_meta(path)
    delta = bool(meta.get("neutral_delta", False))
    storage = meta.get("storage", "native")
    if not meta:
        print("note: pre-metadata checkpoint — assuming classic neutral "
              "layout, native storage")
    with np.load(path) as z:
        keys = set(z.keys())
    is3d = "Ez" in keys or "Ez__bf16" in keys

    if is3d:
        from lbm_tpu.models import plasma3d

        state = ckpt.load3d(path)
        NZ, NY, NX = state.Ex.shape
        cfg = dataclasses.replace(PlasmaConfig(), NX=NX, NY=NY, NZ=NZ,
                                  neutral_delta=delta, storage=storage)
        u = cfg.units()
        f, g = state.f, state.g
        if storage == "bf16":
            f = f.astype(cfg.dtype)
            g = g.astype(cfg.dtype)
        mac = plasma3d.update_macro(
            f, g, state.Ex, state.Ey, state.Ez,
            q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
            neutral_ref=u.rho_n_init if delta else 0.0)
        k = NZ // 2 if z_slice is None else z_slice
        if not 0 <= k < NZ:
            raise SystemExit(f"--z-slice {k} out of range [0, {NZ})")
        print(f"3-D checkpoint {NZ}x{NY}x{NX}: plotting z-slice {k}")
        rho = [np.asarray(r[k]) for r in mac.rho]
        ux = [np.asarray(a[k]) for a in mac.ux]
        uy = [np.asarray(a[k]) for a in mac.uy]
        rho_q = np.asarray(mac.rho_q[k])
        return rho, ux, uy, rho_q, int(state.step)

    from lbm_tpu.models import plasma

    state = ckpt.load(path)
    NY, NX = state.Ex.shape
    cfg = dataclasses.replace(PlasmaConfig(), NX=NX, NY=NY,
                              neutral_delta=delta, storage=storage)
    mac = plasma.compute_macros(cfg, state)
    rho = [np.asarray(mac.rho[s]) for s in range(3)]
    ux = [np.asarray(mac.ux[s]) for s in range(3)]
    uy = [np.asarray(mac.uy[s]) for s in range(3)]
    return rho, ux, uy, np.asarray(mac.rho_q), int(state.step)


def _plot_cavity(path: str, out: str):
    """Cavity checkpoint (f, rho, ux, uy, step): heatmap + quiver +
    streamlines of the single population — the same plot family the
    reference's Python visualizers produce from its output_*.csv dumps
    (old codes/LBM_classic/Python visualize/VelocityDensityField.py)."""
    import matplotlib.pyplot as plt
    import numpy as np

    from lbm_tpu.io import checkpoint as ckpt

    state = ckpt.load_cavity(path)
    storage = ckpt.load_meta(path).get("storage", "native")
    NY, NX = np.asarray(state.rho).shape
    print(f"cavity checkpoint {NY}x{NX} (storage {storage}), "
          f"step {int(state.step)}")
    rho = np.asarray(state.rho, np.float32)
    ux = np.asarray(state.ux, np.float32)
    uy = np.asarray(state.uy, np.float32)
    os.makedirs(out, exist_ok=True)

    fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
    im = ax.imshow(rho, origin="lower", cmap="viridis")
    fig.colorbar(im, ax=ax, label="rho")
    ax.set_title(f"cavity density (step {int(state.step)})")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "density.png"))
    plt.close(fig)

    speed = np.sqrt(ux ** 2 + uy ** 2)
    step_q = max(1, NX // 32)
    Y, X = np.mgrid[0:NY:step_q, 0:NX:step_q]
    fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
    im = ax.imshow(speed, origin="lower", cmap="magma")
    fig.colorbar(im, ax=ax, label="|u|")
    ax.quiver(X, Y, ux[::step_q, ::step_q], uy[::step_q, ::step_q],
              color="w", scale_units="xy", angles="xy")
    ax.set_title("cavity velocity")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "velocity.png"))
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
    ax.streamplot(np.arange(NX), np.arange(NY), ux, uy,
                  color=speed, cmap="magma", density=1.2)
    ax.set_title("cavity streamlines")
    fig.tight_layout()
    fig.savefig(os.path.join(out, "streamlines.png"))
    plt.close(fig)
    print(f"wrote 3 plots to {out}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("--out", default="field_plots")
    p.add_argument("--species", default="e,i,n")
    p.add_argument("--z-slice", type=int, default=None,
                   help="z-slice to plot for 3-D checkpoints "
                        "(default: midplane)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    with np.load(args.checkpoint) as z:
        _keys = set(z.keys())
    if not ("Ex" in _keys or "Ex__bf16" in _keys):
        # no field arrays -> single-population cavity schema
        _plot_cavity(args.checkpoint, args.out)
        return

    rho_s, ux_s, uy_s, rho_q, step = _load_macros(args.checkpoint,
                                                  args.z_slice)
    NY, NX = rho_q.shape
    os.makedirs(args.out, exist_ok=True)

    names = {"e": 0, "i": 1, "n": 2}
    for s in args.species.split(","):
        k = names[s]
        rho, ux, uy = rho_s[k], ux_s[k], uy_s[k]

        fig, ax = plt.subplots(figsize=(6, 5), dpi=110)
        im = ax.imshow(rho, origin="lower", cmap="viridis")
        fig.colorbar(im, ax=ax, label=f"rho_{s}")
        ax.set_title(f"density {s} (step {step})")
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
    im = ax.imshow(rho_q, origin="lower", cmap="RdBu_r")
    fig.colorbar(im, ax=ax, label="rho_q")
    ax.set_title("charge density")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "rho_q.png"))
    plt.close(fig)

    print(f"plots in {args.out}")


if __name__ == "__main__":
    main()
