"""Lattice stencil definitions (D2Q9 now, D3Q19 for the 3-D column mode).

The D2Q9 stencil matches the reference solver's velocity set
(reference: src/plasma.cpp:10-16, src/streaming.cpp:8):

    index:   0  1  2  3  4  5  6  7  8
    cx:      0  1  0 -1  0  1 -1 -1  1
    cy:      0  0  1  0 -1  1  1 -1 -1
    w:     4/9, 1/9 x4, 1/36 x4
    opp:     0  3  4  1  2  7  8  5  6

All arrays are plain numpy so they are baked into jitted programs as
compile-time constants (never traced).
"""
from __future__ import annotations

import numpy as np


class D2Q9:
    """Two-dimensional, nine-velocity lattice."""

    Q = 9
    DIM = 2

    CX = np.array([0, 1, 0, -1, 0, 1, -1, -1, 1], dtype=np.int32)
    CY = np.array([0, 0, 1, 0, -1, 1, 1, -1, -1], dtype=np.int32)
    W = np.array(
        [4.0 / 9.0]
        + [1.0 / 9.0] * 4
        + [1.0 / 36.0] * 4,
        dtype=np.float64,
    )
    OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6], dtype=np.int32)

    # Lattice sound speed squared for the *ideal* D2Q9 stencil. The plasma
    # model does NOT use this constant: it recomputes cs2 from the SI unit
    # scales (reference: include/plasma.hpp:108), which equals 1/3 up to
    # floating-point rounding. The cavity model uses the exact 1/3.
    CS2 = 1.0 / 3.0


class D3Q19:
    """Three-dimensional, nineteen-velocity lattice (stretch-goal 3-D mode).

    Standard D3Q19 velocity set: rest particle, 6 face neighbors, 12 edge
    neighbors. w0=1/3, face 1/18, edge 1/36; cs^2 = 1/3.
    """

    Q = 19
    DIM = 3

    _c = [
        (0, 0, 0),
        (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1),
        (1, 1, 0), (-1, -1, 0), (1, -1, 0), (-1, 1, 0),
        (1, 0, 1), (-1, 0, -1), (1, 0, -1), (-1, 0, 1),
        (0, 1, 1), (0, -1, -1), (0, 1, -1), (0, -1, 1),
    ]
    CX = np.array([c[0] for c in _c], dtype=np.int32)
    CY = np.array([c[1] for c in _c], dtype=np.int32)
    CZ = np.array([c[2] for c in _c], dtype=np.int32)
    W = np.array(
        [1.0 / 3.0]
        + [1.0 / 18.0] * 6
        + [1.0 / 36.0] * 12,
        dtype=np.float64,
    )

    @staticmethod
    def _opposite() -> np.ndarray:
        c = np.stack([D3Q19.CX, D3Q19.CY, D3Q19.CZ], axis=1)
        opp = np.zeros(D3Q19.Q, dtype=np.int32)
        for i in range(D3Q19.Q):
            (j,) = np.where((c == -c[i]).all(axis=1))[0]
            opp[i] = j
        return opp

    CS2 = 1.0 / 3.0


D3Q19.OPP = D3Q19._opposite()
