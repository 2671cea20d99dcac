"""Stage-by-stage grid-state dump harness (the reference's debug oracle).

Replicates the capability of old codes/Plasma debug
(plasma_debug.cpp:1480-1557): after every pipeline stage of every step, dump
the macroscopic fields (ux/uy per species, rho_q, Ex/Ey, T per species) as
readable text blocks, gated to small grids (NX < 11 in the reference). This
is the tool for step-by-step numerical comparison against an independent
implementation.
"""
from __future__ import annotations

from typing import Optional, TextIO

import numpy as np

from ..config import PlasmaConfig
from ..models.plasma import PlasmaState, compute_macros

STAGES = ("macro", "equilibrium", "collide", "stream", "poisson")


class DebugDumper:
    def __init__(self, cfg: PlasmaConfig, path: str = "debug_dump.txt",
                 max_nx: int = 11):
        self.cfg = cfg
        self.enabled = cfg.NX < max_nx
        self._fh: Optional[TextIO] = open(path, "w") if self.enabled else None

    def _grid(self, name: str, arr: np.ndarray) -> None:
        fh = self._fh
        fh.write(f"-- {name} --\n")
        for row in np.asarray(arr)[::-1]:  # y decreasing, like a plot
            fh.write(" ".join(f"{v: .6e}" for v in row) + "\n")

    def dump(self, step: int, stage: str, state: PlasmaState) -> None:
        if not self.enabled:
            return
        assert stage in STAGES, stage
        mac = compute_macros(self.cfg, state)
        fh = self._fh
        fh.write(f"==== step {step} stage {stage} ====\n")
        for k, s in enumerate("ein"):
            self._grid(f"ux_{s}", mac.ux[k])
            self._grid(f"uy_{s}", mac.uy[k])
            self._grid(f"T_{s}", mac.T[k])
        self._grid("rho_q", mac.rho_q)
        self._grid("Ex", state.Ex)
        self._grid("Ey", state.Ey)
        fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
