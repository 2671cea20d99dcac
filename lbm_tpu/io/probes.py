"""Probe-point time series: 19 quantities at 9 fixed lattice points.

Replicates the reference's sampling layout (src/visualize.cpp:77-85): the
domain center plus 8 points offset by (+-NX/4, +-NY/4), sampled every step:

    ux/uy/|u| per species (9), T per species (3), rho per species + rho_q
    (4), Ex/Ey/|E| (3) = 19 quantities.

Sampling gathers 9 scalars per field on-device; the host accumulates the
series and renders the 19 line plots (plot_<name>.png) at close, matching
the reference's build/graphs layout.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

QUANTITIES = [
    "ux_e", "uy_e", "ue_mag",
    "ux_i", "uy_i", "ui_mag",
    "ux_n", "uy_n", "un_mag",
    "T_e", "T_i", "T_n",
    "rho_e", "rho_i", "rho_n", "rho_q",
    "Ex", "Ey", "E_mag",
]


def probe_points(NX: int, NY: int) -> Tuple[np.ndarray, np.ndarray]:
    """(xs, ys) of the 9 sample points (reference: src/visualize.cpp:78-85)."""
    cx, cy, dx, dy = NX // 2, NY // 2, NX // 4, NY // 4
    pts = [
        (cx, cy),
        (cx + dx, cy), (cx - dx, cy),
        (cx, cy + dy), (cx, cy - dy),
        (cx + dx, cy + dy), (cx + dx, cy - dy),
        (cx - dx, cy + dy), (cx - dx, cy - dy),
    ]
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    return xs, ys


def sample(mac, Ex, Ey, xs: np.ndarray, ys: np.ndarray) -> Dict[str, jnp.ndarray]:
    """All 19 quantities at the probe points; returns dict of (9,) arrays."""
    out = {}
    for k, s in enumerate("ein"):
        ux = mac.ux[k][ys, xs]
        uy = mac.uy[k][ys, xs]
        out[f"ux_{s}"] = ux
        out[f"uy_{s}"] = uy
        out[f"u{s}_mag"] = jnp.sqrt(ux * ux + uy * uy)
        out[f"T_{s}"] = mac.T[k][ys, xs]
        out[f"rho_{s}"] = mac.rho[k][ys, xs]
    out["rho_q"] = mac.rho_q[ys, xs]
    ex = Ex[ys, xs]
    ey = Ey[ys, xs]
    out["Ex"] = ex
    out["Ey"] = ey
    out["E_mag"] = jnp.sqrt(ex * ex + ey * ey)
    return out


class ProbeRecorder:
    """Accumulates per-step probe samples WITHOUT host synchronization: each
    record() stores one (19, 9) device array; everything is fetched in a
    single transfer when the series is read (the reference fetched per step,
    synchronously, inside its hot loop)."""

    def __init__(self, NX: int, NY: int):
        self.xs, self.ys = probe_points(NX, NY)
        self._frames: List[jnp.ndarray] = []

    def record(self, mac, Ex, Ey) -> None:
        vals = sample(mac, Ex, Ey, self.xs, self.ys)
        self._frames.append(jnp.stack([vals[q] for q in QUANTITIES]))

    def as_arrays(self) -> Dict[str, np.ndarray]:
        """{quantity: (T, 9) array} — one batched device->host fetch."""
        if not self._frames:
            return {}
        data = np.stack(jax.device_get(self._frames))   # (T, 19, 9)
        return {q: data[:, k, :] for k, q in enumerate(QUANTITIES)}

    def save_csv(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        for q, arr in self.as_arrays().items():
            np.savetxt(os.path.join(out_dir, f"ts_{q}.csv"), arr,
                       delimiter=",",
                       header=",".join(f"p{i}" for i in range(arr.shape[1])))

    def save_plots(self, out_dir: str) -> None:
        """19 line plots, one per quantity, 9 series each (reference:
        src/visualize.cpp:338-375 renders these with OpenCV)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(out_dir, exist_ok=True)
        for q, arr in self.as_arrays().items():
            fig, ax = plt.subplots(figsize=(8, 4.5), dpi=100)
            for p in range(arr.shape[1]):
                ax.plot(arr[:, p], lw=1,
                        label=f"({self.xs[p]},{self.ys[p]})")
            ax.set_xlabel("step")
            ax.set_ylabel(q)
            ax.legend(fontsize=6, ncol=3)
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, f"plot_{q}.png"))
            plt.close(fig)
