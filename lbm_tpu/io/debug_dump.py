"""Stage-by-stage grid-state dump in the reference debug build's format.

Replicates old codes/Plasma debug plasma_debug.cpp:1480-1557 +
DumpGridStateReadable (:1984-2180): after every pipeline stage of every
step, write the macroscopic fields, E, the mass populations and the 9
materialized equilibrium sets as %.6e comma-separated grids (y descending),
gated to small grids (NX < 11 in the reference). The block order, labels
(including the reference's duplicated "Ex" label on the Ey block) and the
3x3 "directions arrangement" preamble match the C++ file, so our dump and
the reference's debug_dump.txt diff line-for-line.

Workflow (documented in README):
    python scripts/run_plasma.py --nx 8 --ny 8 --steps 5 --cpu --f64 \
        --debug-variant --poisson FFT --debug-dump --out build/dbg
    diff build/dbg/debug_dump.txt <reference debug build's debug_dump.txt>
Values agree to print precision; tests/test_io.py gates the CLI dump
against the committed fixture stage-for-stage.
"""
from __future__ import annotations

from typing import Optional, TextIO

import numpy as np

from ..config import PlasmaConfig
from ..models.plasma_staged import EQ_LABELS, STAGES, StageSnapshot

# dump order: (label, dir index) of the 3x3 stencil arrangement
_DIR3X3 = ((6, 2, 5), (3, 0, 1), (7, 4, 8))
_DIR_ORDER = tuple(d for row in _DIR3X3 for d in row)


class DebugDumper:
    def __init__(self, cfg: PlasmaConfig, path: str = "debug_dump.txt",
                 max_nx: int = 11):
        self.cfg = cfg
        self.enabled = cfg.NX < max_nx
        self._fh: Optional[TextIO] = None
        if self.enabled:
            self._fh = open(path, "w")
            self._fh.write("# Debug dump per LBmethod\n")

    def _grid(self, arr) -> None:
        fh = self._fh
        for row in np.asarray(arr, np.float64)[::-1]:  # y descending
            fh.write(",".join(f"{v:.6e}" for v in row) + "\n")

    def _scalar(self, label: str, arr) -> None:
        self._fh.write(label + "\n")
        self._grid(arr)

    def _populations(self, label: str, f_sp) -> None:
        """One species' per-direction grids with the 3x3 stencil preamble."""
        from ..constants import D2Q9

        fh = self._fh
        fh.write(label + "\n")
        fh.write("directions arrangement:\n")
        for row in _DIR3X3:
            fh.write(",".join(str(d) for d in row) + "\n")
        f_np = np.asarray(f_sp, np.float64)
        for d in _DIR_ORDER:
            fh.write(f"{label} dir {d} "
                     f"(cx={int(D2Q9.CX[d])},cy={int(D2Q9.CY[d])})\n")
            self._grid(f_np[d])

    def dump_stage(self, step: int, stage: str, snap: StageSnapshot) -> None:
        """Write one stage snapshot in the C++ block order."""
        if not self.enabled:
            return
        assert stage in STAGES, stage
        fh = self._fh
        fh.write(f"step = {step}\n")
        fh.write(f"stage = {stage}\n")
        mac = snap.mac
        for k, s in enumerate("ein"):
            self._scalar(f"ux_{s}", mac.ux[k])
            self._scalar(f"uy_{s}", mac.uy[k])
        self._scalar("rho_q", mac.rho_q)
        for k, s in enumerate("ein"):
            self._scalar(f"rho_{s}", mac.rho[k])
        self._scalar("Ex", snap.Ex)
        self._scalar("Ex", snap.Ey)   # the reference labels Ey "Ex" too
        for k, s in enumerate("ein"):
            self._populations(f"f_{s}", snap.f[k])
        for label in EQ_LABELS:
            self._populations(label, snap.feq[label])
        fh.write("\n")  # the C++ dump closes each stage with a blank line
        fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
