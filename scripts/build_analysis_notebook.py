#!/usr/bin/env python
"""Build + execute notebooks/combined_analysis.ipynb — the repo's analog
of the reference's notebook-style combined analysis
(`old codes/LBM_classic/Python visualize/grafici.ipynb`, which hardcodes
two cavity scaling curves). Here the cells load the COMMITTED artifact
CSVs (artifacts/scaling/*.csv, reference schema) and overlay the
reference's own measured numbers from BASELINE.md, so the comparison is
data-driven and regenerable:  python scripts/build_analysis_notebook.py
"""
from __future__ import annotations

import os

import nbformat as nbf
from nbclient import NotebookClient

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "notebooks", "combined_analysis.ipynb")

CELLS: list[tuple[str, str]] = [
    ("markdown", """\
# Combined scaling analysis — TPU rebuild vs the C++ reference

Analog of the reference's `old codes/LBM_classic/Python visualize/grafici.ipynb`
(two hardcoded cavity curves), generalized: every curve below loads the
repo's **committed** measurement CSVs (`artifacts/scaling/*.csv`, the
reference's exact `simulation_time_plasma_details.csv` schema) and
overlays the reference's own numbers quoted in `BASELINE.md`.

Provenance: TPU rows were measured on one v5e chip (axon); device-sweep
rows ran on a **virtual CPU mesh** — the identical sharded program a TPU
pod would run, validating shape, not speed (see `*.meta.json` sidecars).
Regenerate with `python scripts/build_analysis_notebook.py`.
"""),
    ("code", """\
import json, os
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
%matplotlib inline

A = os.path.join("..", "artifacts", "scaling")
SOLVER = {0: "NONE", 1: "GS", 2: "SOR", 3: "FFT", 4: "NPS"}
BCN = {0: "Periodic", 1: "BounceBack"}

def load(name):
    \"\"\"rows: (nx, ny, steps, cores, poisson, bc, wall_ms)\"\"\"
    path = os.path.join(A, name)
    if not os.path.exists(path):
        return np.zeros((0, 7))
    out = []
    with open(path) as f:
        next(f)
        for line in f:
            g, st, c, p, b, ms = line.strip().split(",")
            nx, ny = (int(v) for v in g.split("x"))
            out.append((nx, ny, int(st), int(c), int(p), int(b), float(ms)))
    return np.array(out)

def per_step_ms(rows, nx, extra=None):
    m = (rows[:, 0] == nx) & (rows[:, 1] == nx)
    if extra is not None:
        m &= extra(rows)
    if not m.any():
        return np.nan
    return float(np.min(rows[m, 6] / rows[m, 2]))
"""),
    ("markdown", """\
## 1. Cavity grid scaling (reference notebook cell 1)

The reference's committed curve is 10,000 steps on the authors' machine;
the repo rows (fused TPU kernel, `scaling_cavity*.csv`) are normalized to
the same 10k steps. Log-log — the gap is 3–4 orders of magnitude.
"""),
    ("code", """\
ref_n  = np.array([100, 200, 500, 1000, 2000, 5000])
ref_ms = np.array([242, 458, 1880, 8841, 53388, 509222])  # grafici.ipynb cell 1

rows = np.concatenate([load("scaling_cavity.csv"), load("scaling_cavity_bf16.csv")]) \\
    if len(load("scaling_cavity_bf16.csv")) else load("scaling_cavity.csv")
f32 = load("scaling_cavity.csv"); bf16 = load("scaling_cavity_bf16.csv")

def curve(rows):
    ns = sorted(set(rows[:, 0].astype(int)))
    return (np.array(ns),
            np.array([per_step_ms(rows, n) * 10_000 for n in ns]))

fig, (ax, ax2) = plt.subplots(1, 2, figsize=(13, 5), dpi=110)
ax.plot(ref_n, ref_ms, "o-", color="#888", label="C++ reference (authors' machine, 10k steps)")
for r, lab, c in ((f32, "TPU fused f32 (1 v5e chip)", "tab:blue"),
                  (bf16, "TPU fused bf16-delta", "tab:red")):
    if len(r):
        n, ms = curve(r)
        ax.plot(n, ms, "s-", color=c, label=lab)
ax.set_xscale("log"); ax.set_yscale("log")
ax.set_xlabel("Grid dimension N (N x N)"); ax.set_ylabel("time for 10k steps (ms)")
ax.set_title("Cavity grid scaling"); ax.grid(True, ls="--", alpha=0.5); ax.legend()

for r, lab, c in ((f32, "TPU f32", "tab:blue"), (bf16, "TPU bf16", "tab:red")):
    if len(r):
        n, ms = curve(r)
        ax2.plot(n, n * n * 10_000 / ms / 1000, "s-", color=c, label=lab)
ax2.plot(ref_n, ref_n * ref_n * 10_000 / ref_ms / 1000, "o-", color="#888", label="C++ reference")
ax2.set_xscale("log"); ax2.set_yscale("log")
ax2.set_xlabel("Grid dimension N"); ax2.set_ylabel("MLUPS")
ax2.set_title("Cavity throughput"); ax2.grid(True, ls="--", alpha=0.5); ax2.legend()
plt.tight_layout(); plt.show()
"""),
    ("markdown", """\
## 2. Cavity strong scaling (reference notebook cells 2–3)

Reference: 1→16 OpenMP cores at 1000², minimum at 4 cores, flat ≈8.8–9 s
beyond. Repo: device sweep from `scaling_cavity_devices.csv` (virtual CPU
mesh — same sharded program as a pod; shapes, not TPU speed).
"""),
    ("code", """\
ref_c  = np.array([1, 2, 4, 6, 8, 10, 12, 14, 16])
ref_ti = np.array([15795, 9584, 8104, 8451, 9028, 8970, 8830, 8851, 9087])

dev = load("scaling_cavity_devices.csv")
fig, ax = plt.subplots(figsize=(7.5, 5), dpi=110)
ax.plot(ref_c, ref_ti / ref_ti[0], "o-", color="#888",
        label="C++ reference, 1000$^2$ (cores)")
if len(dev):
    for n in sorted(set(dev[:, 0].astype(int))):
        m = dev[:, 0] == n
        cs = sorted(set(dev[m, 3].astype(int)))
        t = np.array([per_step_ms(dev, n, lambda r, c=c: r[:, 3] == c) for c in cs])
        ax.plot(cs, t / t[0], "s-", label=f"rebuild {n}$^2$ (virtual CPU mesh)")
ax.set_xlabel("cores / devices"); ax.set_ylabel("time, normalized to 1")
ax.set_title("Cavity strong scaling (normalized)")
ax.grid(True, ls="--", alpha=0.5); ax.legend(fontsize=8)
fig.text(0.01, 0.005, "virtual-mesh rows validate the sharded program's shape, not TPU speed",
         fontsize=6.5, alpha=0.8)
plt.tight_layout(); plt.show()
"""),
    ("markdown", """\
## 3. Plasma solver ranking (BASELINE.md, 100² × 100 steps, 1 core)

Reference: NONE 1,770 · FFT 2,311 · SOR 4,148 · GS 12,711 ms
(0.565 / 0.433 / 0.241 / 0.079 MLUPS). Repo: `solver_ranking.csv`
(temporally-blocked fused kernels, 128², one v5e chip).
"""),
    ("code", """\
ref_ms = {"NONE": 1770, "FFT": 2311, "SOR": 4148, "GS": 12711}
ref_mlups = {k: 100 * 100 * 100 / v / 1000 for k, v in ref_ms.items()}

rank = load("solver_ranking.csv")
fig, ax = plt.subplots(figsize=(8, 5), dpi=110)
names, mine, ref = [], [], []
for r in rank:
    s = SOLVER[int(r[4])]
    names.append(s)
    mine.append(r[0] * r[1] * r[2] / r[6] / 1000)
    ref.append(ref_mlups.get(s, np.nan))
x = np.arange(len(names))
ax.bar(x - 0.2, mine, 0.4, label="rebuild (v5e, blocked fused kernels)", color="tab:blue")
ax.bar(x + 0.2, ref, 0.4, label="C++ reference (100$^2$)", color="#888")
ax.set_yscale("log"); ax.set_xticks(x); ax.set_xticklabels(names)
ax.set_ylabel("MLUPS (log)"); ax.set_title("Poisson-solver cost ranking")
for i, (a, b) in enumerate(zip(mine, ref)):
    if np.isfinite(b) and b > 0:
        ax.text(i, a * 1.2, f"{a/b:,.0f}x", ha="center", fontsize=8)
ax.grid(True, axis="y", ls="--", alpha=0.5); ax.legend()
plt.tight_layout(); plt.show()
"""),
    ("markdown", """\
## 4. Plasma temporal-blocking ladder

Per-step fused vs whole-grid multistep vs BANDED multistep across grid
sizes (NONE+Periodic; `scaling_plasma_multistep*.csv` +
`banded_plasma_large.json`, all one v5e chip). The banded kernel removes
the VMEM cap but pays (1 + 2K/R) redundant collide work — at ≥1024² the
plasma kernel is already compute-limited, so banding is a wash there
(measured; the cavity twin, with its far lighter collide, gains 1.6×).
"""),
    ("code", """\
path = os.path.join(A, "banded_plasma_large.json")
rows = json.load(open(path)) if os.path.exists(path) else []
if rows:
    fig, ax = plt.subplots(figsize=(8.5, 5), dpi=110)
    for st, c in (("native", "tab:blue"), ("bf16", "tab:red")):
        base = {r["N"]: r["mlups"] for r in rows if r["storage"] == st and r["K"] == 0}
        best = {}
        for r in rows:
            if r["storage"] == st and r["K"]:
                best[r["N"]] = max(best.get(r["N"], 0), r["mlups"])
        ns = sorted(base)
        ax.plot(ns, [base[n] for n in ns], "o-", color=c, label=f"{st} per-step fused")
        bs = sorted(best)
        ax.plot(bs, [best[n] for n in bs], "s--", color=c, alpha=0.7,
                label=f"{st} banded multistep (best K)")
    ax.axhline(0.45, color="#888", ls=":", label="C++ reference golden config (0.45 MLUPS)")
    ax.set_xscale("log", base=2); ax.set_yscale("log")
    ax.set_xlabel("grid N (N x N)"); ax.set_ylabel("MLUPS")
    ax.set_title("Plasma throughput: per-step vs banded temporal blocking (1 v5e chip)")
    ax.grid(True, ls="--", alpha=0.5); ax.legend(fontsize=8)
    plt.tight_layout(); plt.show()
else:
    print("banded_plasma_large.json not present — run scripts/measure_banded_plasma.py")
"""),
]


def main() -> None:
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3", "language": "python",
                                 "display_name": "Python 3"}
    for kind, src in CELLS:
        cell = (nbf.v4.new_markdown_cell(src) if kind == "markdown"
                else nbf.v4.new_code_cell(src))
        nb.cells.append(cell)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    client = NotebookClient(nb, timeout=120,
                            resources={"metadata": {"path": os.path.dirname(OUT)}})
    client.execute()
    nbf.write(nb, OUT)
    n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
    print(f"wrote {OUT} ({len(nb.cells)} cells, {n_out} outputs)")


if __name__ == "__main__":
    main()
