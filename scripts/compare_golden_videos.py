#!/usr/bin/env python
"""Quantitative golden-video comparison vs the C++ reference's committed run.

Decodes the engine's committed golden videos (artifacts/golden_200/video/)
and the reference's (build/video_200x200_200TS/ under /root/reference/)
frame-by-frame — both are fps=1 renders of the 200x200/200-step golden
configuration with the SAME fixed normalization ranges
(src/visualize.cpp:34-48), so the 200 frames align 1:1 — extracts the raw
field tiles from each layout (the reference wraps each tile in a 10 px
border + 30 px label band, src/visualize.cpp:51-55,326-333; this engine
stacks a 14 px label strip above each row of panels, io/video.py), and
reports per-tile PSNR plus the fraction of pixels within a JET-step
tolerance.

This closes the last unverified leg of the golden-artifact contract: the
probe series are fixture-pinned against the compiled C++; the videos were
previously compared by eye only.

Usage:  python scripts/compare_golden_videos.py [--ours DIR] [--ref DIR]
                                                [--json OUT]
Exit code 0 iff every gate passes (mean tile PSNR >= 30 dB, min frame
PSNR >= 20 dB, mean close-pixel fraction >= 0.90).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# (video, rows of tiles, tile labels) — mirrors src/visualize.cpp:242-310
VIDEOS = {
    "density": (1, ["rho_e", "rho_q", "rho_i"]),
    "velocity": (2, ["ux_e", "uy_e", "|u_e|", "ux_i", "uy_i", "|u_i|"]),
    "temperature": (1, ["T_e", "T_i", "T_n"]),
}
NY = NX = 200
REF_BORDER, REF_LABEL = 10, 30            # src/visualize.cpp:51-52
# This engine's label-strip height is auto-detected from the frame shape
# (14 px in the committed artifacts; 30 px once the value-legend strips of
# io/video.py regenerate them): strip = (H - nrows*NY) / nrows.

# Gate calibration (measured on the committed artifacts, this repo):
# the density tiles sit at 41-51 dB mean PSNR and 100% close pixels; the
# electron-velocity tiles are the engine's documented chaotic channels
# (docs/STATUS.md drift table: ux_e/uy_e decorrelate even f32-vs-f64) and
# the ion-velocity / T_i tiles have tiny fixed ranges (|u_i| <= 1e-7,
# src/visualize.cpp:44) where one last-bit numeric wiggle flips a full JET
# band on range-boundary pixels — their PSNR floors are 16-20 dB while
# >= 95% of pixels still agree within 2 JET bands. The primary gate is
# therefore the close-pixel fraction; PSNR gates catch gross breakage
# (wrong range, wrong flip, wrong trajectory all land < 12 dB).
#
# The "f32 = chaos" attribution is PROVEN by the f64 leg (round 5,
# artifacts/golden_200/video_compare_f64.json): rendered from the f64
# engine, the sign-sensitive velocity tiles jump 16-20 dB -> 37-38 dB
# min PSNR / 0.999 close-frac, so the f32 floor is trajectory chaos, not
# a renderer defect. The |u_e| / |u_i| / T_i floors are IDENTICAL between
# the f32 and f64 renders (23.8 / 27.2 / ~19 dB): deterministic JET-band
# boundary flips at the tiny fixed ranges vs OpenCV's JET, bounded by the
# close-frac gate. The f64 leg therefore carries tighter gates.
GATES = {
    # mean_psnr (dB/tile), min_psnr (dB, worst frame), close_frac
    "f32": (22.0, 15.0, 0.95),
    "f64": (25.0, 18.0, 0.955),
}
GATE_MEAN_PSNR, GATE_MIN_PSNR, GATE_CLOSE_FRAC = GATES["f32"]
CLOSE_TOL = 32.0        # ~2 JET colormap steps (256-entry LUT, 8 bands)


def _frames(path):
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        yield fr
    cap.release()


def _tiles_ours(fr, nrows):
    strip = (fr.shape[0] - nrows * NY) // nrows
    h = strip + NY
    return [fr[r * h + strip:(r + 1) * h, t * NX:(t + 1) * NX]
            for r in range(nrows) for t in range(3)]


def _tiles_ref(fr, nrows):
    th, tw = NY + 2 * REF_BORDER + REF_LABEL, NX + 2 * REF_BORDER
    return [fr[r * th + REF_BORDER:r * th + REF_BORDER + NY,
               t * tw + REF_BORDER:t * tw + REF_BORDER + NX]
            for r in range(nrows) for t in range(3)]


def compare(ours_dir: str, ref_dir: str) -> dict:
    results = {}
    for kind, (nrows, labels) in VIDEOS.items():
        a_path = os.path.join(ours_dir, f"video_{kind}.mp4")
        b_path = os.path.join(ref_dir, f"video_{kind}.mp4")
        psnr = {lb: [] for lb in labels}
        close = {lb: [] for lb in labels}
        n = 0
        for fa, fb in zip(_frames(a_path), _frames(b_path)):
            ta = _tiles_ours(fa, nrows)
            tb = _tiles_ref(fb, nrows)
            for lb, a, b in zip(labels, ta, tb):
                a = a.astype(np.float64)
                b = b.astype(np.float64)
                mse = ((a - b) ** 2).mean()
                psnr[lb].append(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
                close[lb].append(
                    float((np.abs(a - b).max(axis=-1) <= CLOSE_TOL).mean()))
            n += 1
        results[kind] = {
            "frames": n,
            "tiles": {
                lb: {
                    "psnr_mean": round(float(np.mean(psnr[lb])), 2),
                    "psnr_min": round(float(np.min(psnr[lb])), 2),
                    "close_frac_mean": round(float(np.mean(close[lb])), 4),
                }
                for lb in labels
            },
        }
    return results


def gates(results: dict, profile: str = "f32") -> list:
    mean_gate, min_gate, close_gate = GATES[profile]
    fails = []
    for kind, r in results.items():
        if r["frames"] != 200:
            fails.append(f"{kind}: {r['frames']} aligned frames != 200")
        for lb, m in r["tiles"].items():
            if m["psnr_mean"] < mean_gate:
                fails.append(f"{kind}/{lb}: mean PSNR {m['psnr_mean']} "
                             f"< {mean_gate}")
            if m["psnr_min"] < min_gate:
                fails.append(f"{kind}/{lb}: min PSNR {m['psnr_min']} "
                             f"< {min_gate}")
            if m["close_frac_mean"] < close_gate:
                fails.append(f"{kind}/{lb}: close-pixel fraction "
                             f"{m['close_frac_mean']} < {close_gate}")
    return fails


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours",
                    default=os.path.join(here, "artifacts/golden_200/video"))
    ap.add_argument("--ref",
                    default="/root/reference/build/video_200x200_200TS")
    ap.add_argument("--json", default=None,
                    help="write the metric tree to this path")
    ap.add_argument("--gates", choices=sorted(GATES), default="f32",
                    help="gate profile: f32 (committed artifacts) or the "
                         "tighter f64 leg (chaos-free trajectories)")
    args = ap.parse_args()

    results = compare(args.ours, args.ref)
    fails = gates(results, args.gates)
    out = {"results": results, "gates_failed": fails,
           "gate_profile": args.gates}
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=2)
    if fails:
        print(f"FAIL: {len(fails)} gate(s) failed", file=sys.stderr)
        return 1
    print("OK: all golden-video gates passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
