#!/usr/bin/env python
"""Scalability harness: timing sweeps over grid size AND device count,
plus the reference's plot families (strong / weak / grid-impact / surface).

The reference accumulates (grid, steps, cores, poisson, bc, wall-ms) rows in
a CSV and post-processes them into strong-scaling, weak-scaling, grid-impact
and 3-D surface plots (build/Scalability_analysis.py:47-114,
build/weak_scalability.py:54-94). Same here, with "cores" carrying the JAX
device count — on real hardware that is TPU chips over ICI; for shape-level
sweeps without a pod the virtual CPU mesh exercises the identical sharded
program (--devices forces the CPU platform with N virtual devices):

    # single-device grid sweep (TPU if available)
    python scripts/scaling.py run  --grids 256,512,1024,2048 --steps 30
    # strong scaling: fixed grid, 1..8 devices (virtual CPU mesh)
    python scripts/scaling.py run  --devices 1,2,4,8 --grids 256 --steps 10
    # weak scaling: fixed sites/device, NY grows with the mesh
    python scripts/scaling.py run  --devices 1,2,4,8 --grids 256 --weak
    python scripts/scaling.py plot --csv build/output/scaling.csv

All rows are scan-timed (one dispatch + trailing whole-state sync per
trial, long/short differenced), matching bench.py — per-step dispatch
timing is tunnel-latency-dominated at small grids and is not used.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CSV_DEFAULT = "build/output/scaling.csv"


def _timed_trials(make_fn, init_fn, steps: int):
    """Scan-timed wall-ms for `steps` steps (bench.py methodology):
    long/short rollout difference cancels sync + dispatch overhead; every
    trial restarts from a fresh state so blown-up windows are never timed."""
    import jax
    import jax.numpy as jnp

    k_short = max(steps // 5, 1)
    roll_long = make_fn(steps)
    roll_short = make_fn(k_short)

    from lbm_tpu.utils.watchdog import finite_reduction
    finite = jax.jit(finite_reduction)

    def trial(roll):
        s = init_fn()
        bool(finite(s))
        t0 = time.perf_counter()
        s = roll(s)
        ok = bool(finite(s))  # device->host read = the only reliable fence
        dt = time.perf_counter() - t0
        assert ok, "non-finite state in timing window"
        return dt

    trial(roll_long)   # compile + warm
    trial(roll_short)
    t_long = min(trial(roll_long) for _ in range(3))
    t_short = min(trial(roll_short) for _ in range(3))
    dt, eff = t_long - t_short, steps - k_short
    if dt <= 0:
        dt, eff = t_long, steps
    return dt * 1000.0, eff


def _run_one(cfg, mesh, steps: int):
    """Wall-ms + effective steps for one config, single-device or sharded."""
    import jax

    from lbm_tpu.models import plasma

    if mesh is None:
        def make_fn(k):
            return jax.jit(plasma.make_rollout(cfg, k), donate_argnums=(0,))
        return _timed_trials(make_fn, lambda: plasma.init_state(cfg), steps)

    from lbm_tpu.parallel import sharding as sh
    sh.validate_grid(cfg, mesh)
    shardings = sh.state_shardings(mesh)
    step = plasma.make_step(cfg)

    def make_fn(k):
        def roll(state):
            out, _ = jax.lax.scan(lambda s, _: (step(s), None), state,
                                  None, length=k)
            return out
        return jax.jit(roll, in_shardings=(shardings,),
                       out_shardings=shardings, donate_argnums=(0,))

    def init_fn():
        return sh.shard_state(plasma.init_state(cfg), mesh)

    return _timed_trials(make_fn, init_fn, steps)


def _run_one_cavity(cfg, mesh, steps: int):
    """Wall-ms + effective steps for the cavity workload (the reference's
    second benchmark family: grid scaling in grafici.ipynb cell 1, strong
    scaling in cells 2-3). Device-sweep rows run the GSPMD jnp path."""
    import jax

    from lbm_tpu.models import cavity

    if mesh is None:
        def make_fn(k):
            return jax.jit(cavity.make_rollout(cfg, k), donate_argnums=(0,))
        return _timed_trials(make_fn, lambda: cavity.init_state(cfg), steps)

    # Device sweeps on the virtual CPU mesh use the GSPMD jnp path (same
    # as the plasma sweeps): compiled XLA code whose partitioning overhead
    # is measurable. The fused halo-kernel path only runs interpreted on
    # CPU, which times the interpreter, not the program - it is covered by
    # tests + dryrun and is the path a real TPU pod runs.
    from lbm_tpu.parallel import sharding as shp
    step1 = shp.make_sharded_cavity_step(cfg, mesh, donate=False)

    def make_fn(k):
        def roll(state):
            out, _ = jax.lax.scan(lambda s, _: (step1(s), None), state,
                                  None, length=k)
            return out
        return jax.jit(roll, donate_argnums=(0,))

    return _timed_trials(make_fn, lambda: cavity.init_state(cfg), steps)


def cmd_run(args):
    device_counts = ([int(d) for d in args.devices.split(",")]
                     if args.devices else [])
    if device_counts:
        # The sharded sweep runs on the virtual CPU mesh: platform + device
        # count must be pinned before jax initializes (the axon site hook
        # overrides JAX_PLATFORMS, so the config API call below is also
        # required — same dance as tests/conftest.py).
        n_virt = max(device_counts)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_virt}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if device_counts:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from lbm_tpu import config as C
    from lbm_tpu.io import timing
    from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y

    grids = [int(g) for g in args.grids.split(",")]
    solvers = [C.PoissonSolver[s] for s in args.solvers.split(",")]
    bc = C.BC[args.bc]

    def measure(nx, ny, sol, n_dev):
        if args.workload == "cavity":
            # single-population cavity (reference: grafici.ipynb tables);
            # solver/bc columns are fixed (NONE, BounceBack walls)
            mesh = None
            if n_dev:
                devs = jax.devices("cpu")[:n_dev]
                mesh = Mesh(np.asarray(devs).reshape(n_dev, 1),
                            (AXIS_Y, AXIS_X))
            backend = args.backend if args.backend in ("jnp", "fused") \
                else "fused"
            if n_dev or jax.default_backend() == "cpu":
                # sharded rows use the GSPMD jnp path; on a CPU-only host
                # the fused kernel cannot lower (bench.py guards the same)
                backend = "jnp"
            cfg = C.CavityConfig(NX=nx, NY=ny, nsteps=args.steps,
                                 dtype=jnp.float32, storage=args.storage,
                                 backend=backend,
                                 lean_macros=args.lean
                                 and backend == "fused",
                                 multistep=(args.multistep
                                            if backend == "fused" else 0))
            wall_ms, eff = _run_one_cavity(cfg, mesh, args.steps)
            wall_ms *= args.steps / eff
            mlups = nx * ny * args.steps / wall_ms / 1000
            timing.append_timing_csv(
                args.csv, NX=nx, NY=ny, nsteps=args.steps,
                n_devices=(n_dev or len(jax.devices())),
                poisson=C.PoissonSolver.NONE.value, bc=C.BC.BOUNCE_BACK.value,
                wall_ms=wall_ms)
            print(f"cavity {nx}x{ny} dev={n_dev or 'native'}: "
                  f"{wall_ms:8.1f} ms ({mlups:8.1f} MLUPS)", flush=True)
            return
        backend = args.backend if n_dev == 0 else "jnp"
        mesh = None
        if n_dev:
            devs = jax.devices("cpu")[:n_dev]
            mesh = Mesh(np.asarray(devs).reshape(n_dev, 1), (AXIS_Y, AXIS_X))
        # plasma temporal blocking: every solver x BC combination blocks
        # (NONE/FFT+BB leave E constant; FFT+periodic solves in-kernel
        # via MXU DFT matmuls; GS/SOR/NPS sweep in-kernel) — fused +
        # single-device only (config-validated)
        ms = (args.multistep
              if (backend == "fused" and not n_dev) else 0)
        cfg = dataclasses.replace(
            C.PlasmaConfig(), NX=nx, NY=ny, nsteps=args.steps, poisson=sol,
            bc=bc, dtype=jnp.float32, backend=backend,
            storage=args.storage,
            neutral_delta=args.storage == "bf16",
            poisson_max_iter=args.poisson_iters, multistep=ms)
        wall_ms, eff = _run_one(cfg, mesh, args.steps)
        wall_ms *= args.steps / eff   # normalize to the nominal step count
        mlups = nx * ny * args.steps / wall_ms / 1000
        timing.append_timing_csv(
            args.csv, NX=nx, NY=ny, nsteps=args.steps,
            n_devices=(n_dev or len(jax.devices())), poisson=sol.value,
            bc=bc.value, wall_ms=wall_ms)
        print(f"{nx}x{ny} {sol.name:4s} dev={n_dev or 'native'}: "
              f"{wall_ms:8.1f} ms ({mlups:8.1f} MLUPS)", flush=True)

    for rep in range(args.repeats):
        for n in grids:
            for sol in solvers:
                if not device_counts:
                    measure(n, n, sol, 0)
                    continue
                for k in device_counts:
                    # weak mode: fixed sites/device — NY grows with the
                    # 1-D (k,1) mesh so each device keeps an (n, NX) slab
                    ny = n * k if args.weak else n
                    measure(n, ny, sol, k)

    # Sidecar provenance: rows from a virtual CPU mesh exercise the
    # IDENTICAL sharded program a TPU pod would run (partitioning,
    # collectives, halo protocol), but their absolute times carry
    # host-CPU execution + per-device dispatch costs — they validate
    # SHAPE, not speed. cmd_plot stamps this on every figure so the
    # device sweeps never read as "multi-chip makes it slower".
    meta_path = args.csv + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    meta["platform"] = jax.default_backend()
    meta["virtual_mesh"] = bool(device_counts) or meta.get(
        "virtual_mesh", False)
    if meta["virtual_mesh"]:
        meta["note"] = (
            f"device counts ran on a VIRTUAL {n_virt if device_counts else 8}"
            "-device CPU mesh: same sharded program as a TPU pod "
            "(shape-level validation); absolute times include host-CPU "
            "execution + per-device dispatch and are NOT TPU times")
    else:
        meta.setdefault(
            "note", f"measured on {jax.devices()[0].device_kind}")
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)


def _load_rows(csv_path):
    import numpy as np
    rows = []
    with open(csv_path) as f:
        next(f)
        for line in f:
            grid, steps, cores, poisson, bc, ms = line.strip().split(",")
            nx, ny = (int(v) for v in grid.split("x"))
            rows.append((nx, ny, int(steps), int(cores), int(poisson),
                         int(bc), float(ms)))
    return np.array(rows)


def _group_mean_std(rows, key_cols):
    """Mean/std of wall-ms over repeated rows with identical keys
    (the reference averages repeats the same way)."""
    import numpy as np
    groups = {}
    for r in rows:
        groups.setdefault(tuple(r[c] for c in key_cols), []).append(r[-1])
    keys = np.array(sorted(groups))
    mean = np.array([np.mean(groups[tuple(k)]) for k in keys])
    std = np.array([np.std(groups[tuple(k)]) for k in keys])
    return keys, mean, std


_SOLVER_NAMES = {0: "NONE", 1: "GS", 2: "SOR", 3: "FFT", 4: "NPS"}
_BC_NAMES = {0: "Periodic", 1: "BounceBack"}


def cmd_plot(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = _load_rows(args.csv)
    out_dir = os.path.dirname(args.csv) or "."
    # columns: 0 nx, 1 ny, 2 steps, 3 cores, 4 poisson, 5 bc, 6 ms
    written = []

    note = None
    if os.path.exists(args.csv + ".meta.json"):
        with open(args.csv + ".meta.json") as fh:
            note = json.load(fh).get("note")

    def save(fig, name):
        path = os.path.join(out_dir, name)
        fig.tight_layout()
        if note:
            fig.subplots_adjust(bottom=0.17)
            fig.text(0.01, 0.01, note, fontsize=6.5, alpha=0.8, wrap=True)
        fig.savefig(path)
        plt.close(fig)
        written.append(name)

    for pv in sorted(set(rows[:, 4].astype(int))):
        for bcv in sorted(set(rows[:, 5].astype(int))):
            sel = rows[(rows[:, 4] == pv) & (rows[:, 5] == bcv)]
            if not len(sel):
                continue
            tag = f"{_BC_NAMES.get(bcv, bcv)}_{_SOLVER_NAMES.get(pv, pv)}"
            # normalize to PER-STEP wall-ms before grouping: the CSV is
            # append-mode across invocations whose --steps may differ, so
            # grouping raw totals would average incommensurable rows
            sel = sel.copy()
            sel[:, 6] = sel[:, 6] / sel[:, 2]
            keys, mean, std = _group_mean_std(sel, (0, 1, 3))
            nx, ny, cores = keys[:, 0], keys[:, 1], keys[:, 2]
            sites = nx * ny

            # strong scaling: fixed grid, time vs devices
            # (reference: Scalability_analysis.py:47-61)
            for gsize in sorted(set(map(tuple, keys[:, :2]))):
                m = (nx == gsize[0]) & (ny == gsize[1])
                if len(set(cores[m])) < 2:
                    continue
                o = np.argsort(cores[m])
                fig, ax = plt.subplots(figsize=(7, 5), dpi=110)
                ax.errorbar(cores[m][o], mean[m][o], yerr=std[m][o],
                            fmt="o-", capsize=5)
                ideal = mean[m][o][0] * cores[m][o][0] / cores[m][o]
                ax.plot(cores[m][o], ideal, "k--", alpha=0.5, label="ideal")
                ax.set_xlabel("Number of Devices")
                ax.set_ylabel("Computation Time per step (ms)")
                ax.set_title(f"Strong scalability — Grid "
                             f"{int(gsize[0])}x{int(gsize[1])}\n{tag}")
                ax.legend()
                ax.grid(True)
                save(fig, f"strong_scaling_{tag}_"
                          f"{int(gsize[0])}x{int(gsize[1])}.png")

            # weak scaling: fixed sites/device, time vs devices
            # (reference: weak_scalability.py:54-94, 5% load tolerance)
            load = sites / cores
            done_loads = []
            fig_c, ax_c = plt.subplots(figsize=(8, 5), dpi=110)
            any_weak = False
            for lv in sorted(set(load)):
                if any(abs(lv - d) / d < 0.05 for d in done_loads):
                    continue
                m = np.abs(load - lv) / lv < 0.05
                if len(set(cores[m])) < 2:
                    continue
                done_loads.append(lv)
                o = np.argsort(cores[m])
                fig, ax = plt.subplots(figsize=(7, 5), dpi=110)
                ax.errorbar(cores[m][o], mean[m][o], yerr=std[m][o],
                            fmt="o-", capsize=5)
                ax.set_xlabel("Number of Devices")
                ax.set_ylabel("Computation Time per step (ms)")
                ax.set_title(f"Weak scalability — load/device ≈ "
                             f"{int(lv)} sites\n{tag}")
                ax.grid(True)
                save(fig, f"weak_scaling_{tag}_load{int(lv)}.png")
                ax_c.errorbar(cores[m][o], mean[m][o], yerr=std[m][o],
                              fmt="o-", capsize=3,
                              label=f"load ≈ {int(lv)}")
                any_weak = True
            if any_weak:
                ax_c.set_xlabel("Number of Devices")
                ax_c.set_ylabel("Computation Time per step (ms)")
                ax_c.set_title(f"Weak scalability comparison\n{tag}")
                ax_c.legend()
                ax_c.grid(True)
                save(fig_c, f"weak_scaling_comparison_{tag}.png")
            else:
                plt.close(fig_c)

            # grid-size impact at each device count
            # (reference: Scalability_analysis.py:64-78)
            for core in sorted(set(cores)):
                m = cores == core
                if len(set(sites[m])) < 2:
                    continue
                o = np.argsort(sites[m])
                fig, ax = plt.subplots(figsize=(7, 5), dpi=110)
                s = keys[m][o]
                mlups = s[:, 0] * s[:, 1] / mean[m][o] / 1000
                ax.plot(sites[m][o], mlups, "o-")
                ax.set_xscale("log", base=2)
                ax.set_xlabel("Grid Size (NX * NY)")
                ax.set_ylabel("MLUPS")
                ax.set_title(f"Grid size impact — {int(core)} device(s)"
                             f"\n{tag}")
                ax.grid(True)
                save(fig, f"grid_impact_{tag}_dev{int(core)}.png")

            # 3-D surface: devices x grid-size -> time
            # (reference: Scalability_analysis.py:82-113)
            if len(set(cores)) > 1 and len(set(sites)) > 1:
                from scipy.interpolate import griddata
                fig = plt.figure(figsize=(8, 6), dpi=110)
                ax = fig.add_subplot(111, projection="3d")
                xi = np.linspace(cores.min(), cores.max(), 30)
                yi = np.linspace(sites.min(), sites.max(), 30)
                Xi, Yi = np.meshgrid(xi, yi)
                Zi = griddata((cores, sites), mean, (Xi, Yi),
                              method="linear")
                surf = ax.plot_surface(Xi, Yi, Zi, cmap="viridis",
                                       edgecolor="none", alpha=0.9)
                ax.set_xlabel("Number of Devices")
                ax.set_ylabel("Grid Size (NX * NY)")
                ax.set_zlabel("Computation Time (ms)")
                ax.set_title(f"3D Scalability Surface\n{tag}")
                fig.colorbar(surf, ax=ax, shrink=0.5, aspect=5,
                             label="Computation Time (ms)")
                save(fig, f"scalability_surface_{tag}.png")

    print(f"{len(written)} plot(s) written to {out_dir}:")
    for name in written:
        print(f"  {name}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--grids", default="128,256,512,1024")
    r.add_argument("--workload", choices=["plasma", "cavity"],
                   default="plasma",
                   help="cavity = the reference's second benchmark family "
                        "(grafici.ipynb grid/strong scaling); solver/bc "
                        "columns are fixed for it")
    r.add_argument("--solvers", default="FFT")
    r.add_argument("--bc", default="PERIODIC")
    r.add_argument("--steps", type=int, default=30)
    r.add_argument("--backend", default="fused")
    r.add_argument("--multistep", type=int, default=0, metavar="K",
                   help="temporal blocking, K steps per kernel launch "
                        "(VMEM-resident grids; cavity <=~512^2, plasma "
                        "<=~256^2 with NONE+periodic only)")
    r.add_argument("--lean", action="store_true",
                   help="cavity: lean-macro fused mode (populations-only "
                        "traffic; f32 accuracy-identical)")
    r.add_argument("--storage", choices=["native", "bf16"], default="native",
                   help="population storage precision for the sweep")
    r.add_argument("--devices", default="",
                   help="comma list of device counts -> sharded sweep on a "
                        "virtual CPU mesh (e.g. 1,2,4,8)")
    r.add_argument("--weak", action="store_true",
                   help="weak scaling: NY = grid * n_devices (fixed "
                        "sites/device on the 1-D mesh)")
    r.add_argument("--repeats", type=int, default=1,
                   help="repeat every measurement (plots average + std)")
    r.add_argument("--poisson-iters", type=int, default=100)
    r.add_argument("--csv", default=CSV_DEFAULT)
    r.set_defaults(fn=cmd_run)
    pl = sub.add_parser("plot")
    pl.add_argument("--csv", default=CSV_DEFAULT)
    pl.set_defaults(fn=cmd_plot)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
