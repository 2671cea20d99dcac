"""Asynchronous video recording: device renders, host encodes off the hot path.

The reference encodes three MP4s synchronously inside the time loop
(src/plasma.cpp:516, a large serial fraction). Here the colormap/mosaic
rendering runs on-device (io/colormap.py), the resulting small uint8 frames
are fetched and encoded on a background thread, and the step loop never
blocks on IO.

Writer backends, in preference order:
  1. OpenCV mp4v MP4 — the reference's exact artifact format
     (src/visualize.cpp:26-28: cv::VideoWriter with fourcc "mp4v")
  2. native C++ uncompressed AVI (native/aviwriter.cpp, no dependencies)
  3. animated GIF via PIL (pure-Python fallback)
Set LBM_VIDEO_FORMAT=avi|gif to skip the MP4 backend.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import List, Optional

import numpy as np

from . import colormap


class _Mp4Backend:
    """MP4 via OpenCV's mp4v codec (matches the reference's writers)."""

    def __init__(self, path: str, width: int, height: int, fps: int):
        import cv2

        self.path = os.path.splitext(path)[0] + ".mp4"
        self._w = cv2.VideoWriter(
            self.path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height))
        if not self._w.isOpened():
            raise RuntimeError(f"cv2.VideoWriter cannot open {self.path}")

    def write(self, frame: np.ndarray) -> None:
        """frame: (H, W, 3) uint8 RGB (cv2 wants BGR)."""
        self._w.write(np.ascontiguousarray(frame[..., ::-1]))

    def close(self) -> None:
        self._w.release()


class _GifBackend:
    def __init__(self, path: str, fps: int):
        self.path = os.path.splitext(path)[0] + ".gif"
        self.fps = fps
        self.frames: List[np.ndarray] = []

    def write(self, frame: np.ndarray) -> None:
        self.frames.append(frame)

    def close(self) -> None:
        if not self.frames:
            return
        from PIL import Image

        imgs = [Image.fromarray(f) for f in self.frames]
        imgs[0].save(self.path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / self.fps), loop=0)


def _open_writer(path: str, width: int, height: int, fps: int):
    from . import avi

    fmt = os.environ.get("LBM_VIDEO_FORMAT", "mp4")
    if fmt == "mp4":
        try:
            return _Mp4Backend(path, width, height, fps)
        except Exception:
            pass  # no cv2 / codec — fall through to the native writer
    if fmt != "gif" and avi.available():
        w = avi.AviWriter(path, width, height, fps)
        w.path = path
        return w
    return _GifBackend(path, fps)


_LABELS = {
    "density": [["rho_e", "rho_q", "rho_i"]],
    "velocity": [["ux_e", "uy_e", "|u_e|"], ["ux_i", "uy_i", "|u_i|"]],
    "temperature": [["T_e", "T_i", "T_n"]],
}
_LABEL_H = 30  # pixels per label strip (name + value legend + colorbar)

# panel label -> io.colormap.RANGES key where they differ
_RANGE_KEYS = {"|u_e|": "u_mag_e", "|u_i|": "u_mag_i"}


def _fmt_value(v: float) -> str:
    """Compact legend number: fixed-point when readable, scientific for
    the tiny fixed ranges (|u| <= 1e-7)."""
    if v == 0:
        return "0"
    a = abs(v)
    return f"{v:.2f}" if 0.01 <= a < 1000 else f"{v:.0e}"


def _label_strip(labels, width: int) -> np.ndarray:
    """A text strip naming each panel WITH its value legend: the fixed
    normalization range (min | mid | max) and a JET colorbar — the
    per-quantity legend panels of the reference's debug build
    (old codes/Plasma debug/plasma_debug.hpp:234-262, makeColorLegend:
    colorbar + max/mid/min values), folded into the label band so the
    field tiles keep the release build's exact geometry. Rendered once
    per stream with PIL."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (width, _LABEL_H), (32, 32, 32))
    d = ImageDraw.Draw(img)
    panel_w = width // len(labels)
    for i, text in enumerate(labels):
        vmin, vmax = colormap.RANGES[_RANGE_KEYS.get(text, text)]
        mid = 0.5 * (vmin + vmax)
        d.text((i * panel_w + 4, 0), text, fill=(255, 255, 255))
        d.text((i * panel_w + 4, 11),
               f"{_fmt_value(vmin)} | {_fmt_value(mid)} | {_fmt_value(vmax)}",
               fill=(200, 200, 200))
    arr = np.asarray(img).copy()
    # horizontal JET colorbar (min -> max) along the bottom of each panel
    pal = colormap.JET_PALETTE
    for i in range(len(labels)):
        x0, x1 = i * panel_w + 4, min((i + 1) * panel_w - 4, width)
        if x1 - x0 > 8:
            idx = np.linspace(0.0, 255.0, x1 - x0).astype(np.uint8)
            arr[_LABEL_H - 6:_LABEL_H - 2, x0:x1] = pal[idx]
    return arr


class VideoRecorder:
    """Three-stream recorder (density / velocity / temperature).

    Call .record(macros) each step with the Macros namedtuple; frames are
    rendered on-device and queued; a worker thread encodes them with
    per-panel label strips.
    """

    def __init__(self, out_dir: str, NX: int, NY: int, fps: int = 1):
        # fps=1 replicates the reference's writers (src/visualize.cpp:57)
        os.makedirs(out_dir, exist_ok=True)
        self._paths = {
            "density": os.path.join(out_dir, "video_density.avi"),
            "velocity": os.path.join(out_dir, "video_velocity.avi"),
            "temperature": os.path.join(out_dir, "video_temperature.avi"),
        }
        h_lbl = _LABEL_H
        self._writers = {
            "density": _open_writer(self._paths["density"], 3 * NX,
                                    NY + h_lbl, fps),
            "velocity": _open_writer(self._paths["velocity"], 3 * NX,
                                     2 * (NY + h_lbl), fps),
            "temperature": _open_writer(self._paths["temperature"], 3 * NX,
                                        NY + h_lbl, fps),
        }
        # backends may rewrite the extension (.mp4 / .gif)
        self._paths = {k: w.path for k, w in self._writers.items()}
        self._strips = {k: [_label_strip(row, 3 * NX) for row in rows]
                        for k, rows in _LABELS.items()}
        self._ny = NY
        self._q: "queue.Queue" = queue.Queue(maxsize=8)
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()
        self._err: Optional[BaseException] = None

    def _label(self, kind: str, rgb: np.ndarray) -> np.ndarray:
        """Interleave a label strip above each row of panels."""
        rows = []
        for r, strip in enumerate(self._strips[kind]):
            rows.append(strip)
            rows.append(rgb[r * self._ny: (r + 1) * self._ny])
        return np.concatenate(rows, axis=0)

    def _drain(self) -> None:
        pal = colormap.JET_PALETTE
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                d, v, t = item  # uint8 palette-index frames (device arrays)
                self._writers["density"].write(
                    self._label("density", pal[np.asarray(d)]))
                self._writers["velocity"].write(
                    self._label("velocity", pal[np.asarray(v)]))
                self._writers["temperature"].write(
                    self._label("temperature", pal[np.asarray(t)]))
            except BaseException as e:  # surfaced on close()
                self._err = e

    def record(self, mac) -> None:
        """mac: lbm_tpu.ops.macros.Macros (device arrays)."""
        frames = colormap.render_all(
            mac.rho[0], mac.rho[1], mac.rho_q,
            mac.ux[0], mac.uy[0], mac.ux[1], mac.uy[1],
            mac.T[0], mac.T[1], mac.T[2],
        )
        # enqueue the DEVICE arrays; the worker thread performs the
        # device->host fetch so the step loop never blocks on transfer
        self._q.put(frames)

    def close(self) -> None:
        self._q.put(None)
        self._worker.join()
        for w in self._writers.values():
            w.close()
        if self._err is not None:
            raise self._err

    @property
    def paths(self):
        return dict(self._paths)
