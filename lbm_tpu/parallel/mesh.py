"""Device-mesh helpers for lattice domain decomposition.

The reference's only parallelism is OpenMP shared-memory loops over the
lattice (SURVEY.md section 2.3); the TPU-native equivalent is a 2-D device
mesh with the (NY, NX) lattice dims sharded across it. Streaming's 1-cell
halo becomes XLA collective-permutes over ICI; the FFT Poisson solve becomes
XLA's sharded FFT (collective transpose).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_Y = "dy"
AXIS_X = "dx"


def factor_2d(n: int) -> Tuple[int, int]:
    """Factor n devices into the most-square (ny, nx) grid."""
    best = (1, n)
    for a in range(1, int(math.isqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """2-D mesh (AXIS_Y, AXIS_X) over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = factor_2d(len(devices))
    ny, nx = shape
    if ny * nx != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(ny, nx)
    return Mesh(arr, (AXIS_Y, AXIS_X))
