"""Trajectory parity against the ACTUAL reference C++ implementation.

tests/fixtures/ref_dump_solver{0,1,2,4}.txt.gz are stage-by-stage dumps
produced by compiling and running the reference's own debug build
(old codes/Plasma debug/plasma_debug.cpp, whose DumpGridStateReadable
writes every field including the per-direction f populations) at 8x8 for 5
steps with the golden physical parameters, one file per Poisson solver
(0=NONE, 1=GS, 2=SOR, 3=FFT, 4=NPS; the FFT build uses an exact naive-DFT
drop-in for the absent FFTW, valid at 8x8).

The debug build dispatches the *periodic* iterative sweeps under periodic
BCs and leaves E untouched for NONE, i.e. the behavior of
CompatFlags(dirichlet_iterative_under_periodic=False,
            none_solver_kills_external_field=False).

The mass/field pipeline is closed under f (the mass collisions, macros,
and Poisson solve never read g), so matching the f trajectory + E fields
validates everything except the thermal (g) pipeline, which the numpy
oracle covers.

Print precision in the dumps is %.6e, so comparisons are gated at ~1e-5
relative.
"""
import dataclasses
import gzip
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import BC, CompatFlags, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

_SCALAR_FIELDS = ["ux_e", "uy_e", "ux_i", "uy_i", "ux_n", "uy_n",
                  "rho_q", "rho_e", "rho_i", "rho_n"]


def parse_dump(path, NX=8, NY=8):
    """-> {(step, stage): {field: (NY, NX) array, 'f_e': (9, NY, NX), ...}}"""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    out = {}
    i = 0
    cur = None

    def read_grid(i):
        rows = []
        for r in range(NY):
            rows.append([float(v) for v in lines[i + r].split(",")])
        # dumped with y descending; flip to y-ascending
        return np.asarray(rows)[::-1], i + NY

    while i < len(lines):
        ln = lines[i]
        if ln.startswith("step = "):
            step = int(ln.split("=")[1])
            stage = lines[i + 1].split("=")[1].strip()
            cur = out[(step, stage)] = {}
            i += 2
            continue
        if cur is None:
            i += 1
            continue
        if ln in _SCALAR_FIELDS:
            grid, i2 = read_grid(i + 1)
            cur[ln] = grid
            i = i2
            continue
        if ln == "Ex":
            grid, i2 = read_grid(i + 1)
            # the dump labels Ey as a second "Ex" block
            cur["Ey" if "Ex" in cur else "Ex"] = grid
            i = i2
            continue
        m = re.match(r"(f(?:_eq)?_[ein](?:_[ein])?) dir (\d+)", ln)
        if m:
            name, d = m.group(1), int(m.group(2))
            grid, i2 = read_grid(i + 1)
            cur.setdefault(name, {})[d] = grid
            i = i2
            continue
        i += 1
    return out


def _f_array(block) -> np.ndarray:
    return np.stack([block[d] for d in range(9)])


def _run_engine(solver, nsteps=5):
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=8, NY=8, nsteps=nsteps, dtype=jnp.float64,
        poisson=solver, bc=BC.PERIODIC,
        compat=CompatFlags(none_solver_kills_external_field=False,
                           dirichlet_iterative_under_periodic=False,
                           debug_variant=True))
    states = [plasma.init_state(cfg)]
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(nsteps):
        states.append(step(states[-1]))
    return cfg, states


_SOLVERS = {0: PoissonSolver.NONE, 1: PoissonSolver.GS,
            2: PoissonSolver.SOR, 3: PoissonSolver.FFT,
            4: PoissonSolver.NPS}


@pytest.mark.parametrize("code", [0, 1, 2, 3, 4])
def test_f_trajectory_matches_cpp_reference(code):
    dump = parse_dump(os.path.join(FIXDIR, f"ref_dump_solver{code}.txt.gz"))
    cfg, states = _run_engine(_SOLVERS[code])
    for t in range(5):
        ref = dump[(t, "Streaming")]
        mine = states[t + 1]
        for k, s in enumerate("ein"):
            got = np.asarray(mine.f[k])
            want = _f_array(ref[f"f_{s}"])
            scale = np.abs(want).max()
            np.testing.assert_allclose(
                got, want, rtol=3e-6, atol=3e-6 * scale,
                err_msg=f"f_{s} after step {t} (solver {code})")


@pytest.mark.parametrize("code", [1, 2, 3, 4])
def test_efield_matches_cpp_reference(code):
    dump = parse_dump(os.path.join(FIXDIR, f"ref_dump_solver{code}.txt.gz"))
    cfg, states = _run_engine(_SOLVERS[code])
    for t in range(5):
        ref = dump[(t, "SolvePoisson")]
        mine = states[t + 1]
        scale = max(np.abs(ref["Ex"]).max(), np.abs(ref["Ey"]).max(), 1e-12)
        np.testing.assert_allclose(np.asarray(mine.Ex), ref["Ex"],
                                   rtol=3e-5, atol=3e-5 * scale,
                                   err_msg=f"Ex after step {t}")
        np.testing.assert_allclose(np.asarray(mine.Ey), ref["Ey"],
                                   rtol=3e-5, atol=3e-5 * scale,
                                   err_msg=f"Ey after step {t}")


@pytest.mark.parametrize("code", [0, 1])
def test_macros_match_cpp_reference(code):
    dump = parse_dump(os.path.join(FIXDIR, f"ref_dump_solver{code}.txt.gz"))
    cfg, states = _run_engine(_SOLVERS[code])
    for t in range(5):
        ref = dump[(t, "UpdateMacro")]
        mac = plasma.compute_macros(cfg, states[t])
        for k, s in enumerate("ein"):
            rscale = np.abs(ref[f"rho_{s}"]).max()
            np.testing.assert_allclose(
                np.asarray(mac.rho[k]), ref[f"rho_{s}"],
                rtol=3e-6, atol=3e-6 * rscale,
                err_msg=f"rho_{s} at step {t}")
            # atol floor 1e-15: fp-cancellation noise where the C++ sums
            # happen to cancel exactly to 0 (e.g. quiescent neutral u)
            uscale = np.abs(ref[f"ux_{s}"]).max()
            np.testing.assert_allclose(
                np.asarray(mac.ux[k]), ref[f"ux_{s}"],
                rtol=3e-5, atol=max(1e-4 * uscale, 1e-15),
                err_msg=f"ux_{s} at step {t}")
        qscale = np.abs(ref["rho_q"]).max()
        np.testing.assert_allclose(
            np.asarray(mac.rho_q), ref["rho_q"],
            rtol=3e-5, atol=max(1e-4 * qscale, 1e-15),
            err_msg=f"rho_q at step {t}")


@pytest.mark.parametrize("code", [0, 1])
def test_bounceback_trajectory_matches_cpp_reference(code):
    """Bounce-back walls, including the reference's corner-hole quirks."""
    dump = parse_dump(os.path.join(FIXDIR, f"ref_dump_solver{code}_bb.txt.gz"))
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=8, NY=8, nsteps=5, dtype=jnp.float64,
        poisson=_SOLVERS[code], bc=BC.BOUNCE_BACK,
        compat=CompatFlags(none_solver_kills_external_field=False,
                           dirichlet_iterative_under_periodic=False,
                           debug_variant=True))
    states = [plasma.init_state(cfg)]
    step = jax.jit(plasma.make_step(cfg))
    for _ in range(5):
        states.append(step(states[-1]))
    for t in range(5):
        ref = dump[(t, "Streaming")]
        mine = states[t + 1]
        for k, s in enumerate("ein"):
            want = _f_array(ref[f"f_{s}"])
            scale = np.abs(want).max()
            np.testing.assert_allclose(
                np.asarray(mine.f[k]), want, rtol=3e-6, atol=3e-6 * scale,
                err_msg=f"f_{s} after step {t} (bounce-back, solver {code})")


def test_cli_debug_dump_matches_cpp_reference(tmp_path):
    """The --debug-dump CLI writes all 5 pipeline stages of every step in
    the C++ debug build's own format; every field of every (step, stage)
    must match the reference fixture (FFT solver, 8x8, 5 steps).

    This is the driver-level counterpart of the oracle tests above: a user
    can produce a dump with one command and `diff` it against the C++
    build's debug_dump.txt (values agree to print precision; a handful of
    cells differ as +-0 vs ~1e-23 f64 cancellation noise).
    """
    import subprocess
    import sys

    out = tmp_path / "dbg"
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "run_plasma.py"),
         "--cpu", "--f64", "--nx", "8", "--ny", "8", "--steps", "5",
         "--poisson", "FFT", "--debug-variant", "--debug-dump",
         "--no-video", "--no-plots", "--watchdog-every", "0",
         "--out", str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    mine = parse_dump(str(out / "debug_dump.txt"))
    ref = parse_dump(os.path.join(FIXDIR, "ref_dump_solver3.txt.gz"))
    assert set(mine) == set(ref)            # same (step, stage) coverage
    assert len(ref) == 25                   # 5 steps x 5 stages
    for key in sorted(ref):
        for field in ref[key]:
            want, got = ref[key][field], mine[key][field]
            if isinstance(want, dict):      # population set: dir -> grid
                want, got = _f_array(want), _f_array(got)
            scale = np.abs(want).max()
            np.testing.assert_allclose(
                got, want, rtol=3e-6, atol=max(3e-6 * scale, 1e-15),
                err_msg=f"{field} at {key}")


def _parse_probe_fixture(path):
    """-> {field: (T, 9) array} from the release-build probe-series dump."""
    import csv

    series = {}
    with gzip.open(path, "rt") as fh:
        rd = csv.reader(fh)
        next(rd)
        for row in rd:
            series.setdefault(row[0], []).append([float(v) for v in row[2:]])
    return {k: np.asarray(v) for k, v in series.items()}


def test_probe_series_match_cpp_reference_200x200():
    """Golden-trajectory parity over the FULL golden window: the 19 probe
    time series of the reference RELEASE build (src/plasma.cpp +
    src/visualize.cpp, compiled here via
    scripts/make_reference_fixtures.sh) at 200x200 for all 200 steps with
    the golden parameters and the FFT solver — the exact configuration of
    the committed golden artifacts (src/main_plasma.cpp:16-51,
    build/graphs_200x200_200TS/).

    Alignment (src/plasma.cpp:459-525): row t carries the macros computed
    at the TOP of iteration t (the pre-step state) and the E fields from
    the END of iteration t (post-Poisson).

    Measured deviations (f64 engine vs C++ f64, max over all 200 steps,
    relative to each series' scale): <=1.5e-9 for the charged/E fields,
    <=2e-8 for the neutral-coupled thermal series T_n, and <=3.4e-8 for
    the neutral velocities. The only f64-vs-f64 rounding difference is our
    FFT vs the fixture's naive-DFT drop-in (~1e-16), amplified by the
    trajectory's late-time chaos; the neutral channels additionally cancel
    against rho_n ~ 1.8e10 (the reference's own fragility). The 1e-5 gate
    leaves margin for BLAS/libm variation.
    """
    from lbm_tpu.io import probes

    ref = _parse_probe_fixture(
        os.path.join(FIXDIR, "ref_probes_200x200_200steps_fft.csv.gz"))
    nsteps = 200
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=200, NY=200, nsteps=nsteps, dtype=jnp.float64,
        poisson=PoissonSolver.FFT, bc=BC.PERIODIC)
    xs, ys = probes.probe_points(cfg.NX, cfg.NY)
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg), donate_argnums=(0,))
    mine = {k: [] for k in ref}
    for t in range(nsteps):
        mac = plasma.compute_macros(cfg, state)
        state = step(state)
        for k, v in probes.sample(mac, state.Ex, state.Ey, xs, ys).items():
            mine[k].append(np.asarray(v))
    for k in ref:
        got = np.stack(mine[k])
        scale = np.abs(ref[k]).max()
        np.testing.assert_allclose(
            got, ref[k], rtol=1e-5, atol=1e-5 * scale,
            err_msg=f"probe series {k}")
