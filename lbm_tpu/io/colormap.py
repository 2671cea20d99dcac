"""Device-side field -> RGB rendering (the reference's OpenCV JET pipeline).

The reference copies every field to the host and runs cv::normalize +
applyColorMap(JET) + flip per frame, synchronously inside the hot loop
(src/visualize.cpp:318-333). Here the normalization, JET lookup, vertical
flip and mosaic layout all run on-device as one jitted function producing a
uint8 RGB frame; only the final small frame crosses to the host.

Fixed normalization ranges replicate src/visualize.cpp:34-48 so frames are
comparable across time and across implementations.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

# Fixed ranges (reference: src/visualize.cpp:34-48)
RANGES = {
    "rho_e": (0.0, 1.0),
    "rho_i": (0.0, 1822.0),
    "rho_q": (0.0, 1.5),
    "ux_e": (-1e-7, 1e-7),
    "uy_e": (-1e-7, 1e-7),
    "u_mag_e": (0.0, 1e-7),
    "ux_i": (-1e-7, 1e-7),
    "uy_i": (-1e-7, 1e-7),
    "u_mag_i": (0.0, 1e-7),
    "T_e": (0.0, 1.0),
    "T_i": (0.0, 0.5),
    "T_n": (0.0, 0.5),
}


def jet(v: jnp.ndarray) -> jnp.ndarray:
    """Classic JET colormap: v in [0,1] -> uint8 RGB (..., 3)."""
    v = jnp.clip(v, 0.0, 1.0)
    r = jnp.clip(1.5 - jnp.abs(4.0 * v - 3.0), 0.0, 1.0)
    g = jnp.clip(1.5 - jnp.abs(4.0 * v - 2.0), 0.0, 1.0)
    b = jnp.clip(1.5 - jnp.abs(4.0 * v - 1.0), 0.0, 1.0)
    rgb = jnp.stack([r, g, b], axis=-1)
    return (rgb * 255.0 + 0.5).astype(jnp.uint8)


def jet_index(v: jnp.ndarray) -> jnp.ndarray:
    """Quantized colormap index (uint8): 1/3 the device->host traffic of an
    RGB frame; the host expands it through JET_PALETTE."""
    return (jnp.clip(v, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def _palette() -> "np.ndarray":
    import numpy as np
    v = np.linspace(0.0, 1.0, 256)
    r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255 + 0.5).astype("uint8")


JET_PALETTE = _palette()


def colorize(field: jnp.ndarray, vmin: float, vmax: float) -> jnp.ndarray:
    """Fixed-range normalize + quantize + vertical flip (y up -> row down).

    Returns a uint8 palette-index image; the host expands it to RGB via
    JET_PALETTE (same colors as jet())."""
    v = (field - vmin) / (vmax - vmin)
    return jet_index(v)[::-1, :]


def mosaic(panels: Sequence[jnp.ndarray], ncols: int) -> jnp.ndarray:
    """Tile (H, W) panels into a grid, row-major."""
    rows = [jnp.concatenate(panels[i:i + ncols], axis=1)
            for i in range(0, len(panels), ncols)]
    return jnp.concatenate(rows, axis=0)


def density_frame(rho_e, rho_i, rho_q) -> jnp.ndarray:
    """3-panel density frame: rho_e | rho_q | rho_i (the reference's tile
    order, src/visualize.cpp:243-245)."""
    return mosaic([
        colorize(rho_e, *RANGES["rho_e"]),
        colorize(rho_q, *RANGES["rho_q"]),
        colorize(rho_i, *RANGES["rho_i"]),
    ], ncols=3)


def velocity_frame(ux_e, uy_e, ux_i, uy_i) -> jnp.ndarray:
    """2x3 velocity frame: (ux, uy, |u|) for electrons over ions."""
    mag_e = jnp.sqrt(ux_e * ux_e + uy_e * uy_e)
    mag_i = jnp.sqrt(ux_i * ux_i + uy_i * uy_i)
    return mosaic([
        colorize(ux_e, *RANGES["ux_e"]),
        colorize(uy_e, *RANGES["uy_e"]),
        colorize(mag_e, *RANGES["u_mag_e"]),
        colorize(ux_i, *RANGES["ux_i"]),
        colorize(uy_i, *RANGES["uy_i"]),
        colorize(mag_i, *RANGES["u_mag_i"]),
    ], ncols=3)


def temperature_frame(T_e, T_i, T_n) -> jnp.ndarray:
    return mosaic([
        colorize(T_e, *RANGES["T_e"]),
        colorize(T_i, *RANGES["T_i"]),
        colorize(T_n, *RANGES["T_n"]),
    ], ncols=3)


@functools.partial(jax.jit, static_argnames=())
def render_all(rho_e, rho_i, rho_q, ux_e, uy_e, ux_i, uy_i, T_e, T_i, T_n):
    """All three video frames in one device call."""
    return (
        density_frame(rho_e, rho_i, rho_q),
        velocity_frame(ux_e, uy_e, ux_i, uy_i),
        temperature_frame(T_e, T_i, T_n),
    )
