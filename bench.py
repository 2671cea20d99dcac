"""Headline benchmark: 3-species plasma MLUPS on one TPU chip.

Prints ONE JSON line:
    {"metric": "plasma_mlups_2048x2048_fft_periodic_1chip_bf16",
     "value": N, "unit": "MLUPS", "vs_baseline": N, "extra": {...}}

MLUPS = NX*NY*steps / wall_seconds / 1e6, one site-update = the full
pipeline (moments + 18 equilibria + triple-BGK collide + Guo forcing + DDF
thermal + streaming + FFT Poisson + E-field) over all 6 D2Q9 populations —
the same accounting as BASELINE.md. The C++ reference peaks at ~0.99 MLUPS
(200x200, 13 cores, FFT+Periodic); vs_baseline is the headline metric (the
engine's BEST mode, bf16 storage by default) over that number. "extra"
carries the f32-native headline grid, the BASELINE target grid (4096^2 by
default, both storage modes, with its own vs_baseline_4096_bf16 ratio) and
the 3-D fused kernel. Env knobs: BENCH_N, BENCH_STEPS, BENCH_BACKEND,
BENCH_STORAGE (headline mode: bf16|native), BENCH_N_EXTRA, BENCH_N_3D,
BENCH_3D_WIDE (cross-section of the 64-deep wide-3-D extra; 0 disables),
BENCH_BUDGET_S (wall budget for the extras, default 720 s — an extra only
starts under budget; skipped ones record "skipped: budget"),
BENCH_SKIP_EXTRAS=1 (headline only — the crash-retry path sets this),
BENCH_CHILD_TIMEOUT_S / BENCH_RETRY_TIMEOUT_S (hard per-attempt deadlines,
default 2400/900 s — a hung axon tunnel can block a child with NO output;
the parent kills it, retries headline-only, and on total failure emits an
honest value=0 line with an "error" field so the record is parseable).

Driver contract: the headline JSON line is printed and flushed the moment
the primary measurement returns, and the full line is RE-printed after
every completed extra — the driver takes the last parseable line, so a
timeout at any point still captures everything finished by then.

Timing notes: under the axon tunnel block_until_ready returns before the
device work drains, so we synchronize by fetching a scalar from the final
state — specifically a whole-state isfinite reduction, which both fences
the device and guards the entire benchmark window against a localized
blow-up (the golden parameters are physically unstable at large grids).
The reduction cost is identical in the long and short windows, so the
long/short difference cancels it along with the ~30 ms tunnel latency.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

BASELINE_MLUPS = 0.99  # reference best (BASELINE.md: 200x200, 13 cores)


def measure(n: int, steps: int, backend: str, storage: str = "native",
            solver: str | None = None) -> float:
    import jax
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig, PoissonSolver
    from lbm_tpu.models import plasma

    cfg = dataclasses.replace(
        PlasmaConfig(), NX=n, NY=n, nsteps=steps, dtype=jnp.float32,
        backend=backend, storage=storage,
        neutral_delta=(storage == "bf16"),
        **({"poisson": PoissonSolver[solver]} if solver else {}),
    )
    # Timing design: scanned rollouts (one dispatch + one sync each), every
    # trial re-started from the initial state (blown-up states must not be
    # timed), and a long/short difference to cancel the sync overhead.
    # Best of 3, reproducible to a few percent.
    k_short = max(steps // 5, 1)
    roll_long = jax.jit(plasma.make_rollout(cfg, steps), donate_argnums=(0,))
    roll_short = jax.jit(plasma.make_rollout(cfg, k_short),
                         donate_argnums=(0,))

    from lbm_tpu.utils.watchdog import finite_reduction
    finite = jax.jit(finite_reduction)

    def sync(s):
        # a real device->host read is the only reliable fence here; the
        # whole-state reduction doubles as the blow-up guard
        return bool(finite(s))

    def trial(roll):
        s = plasma.init_state(cfg)
        sync(s)
        t0 = time.perf_counter()
        s = roll(s)
        ok = sync(s)
        dt = time.perf_counter() - t0
        assert ok, f"non-finite state in benchmark window ({n}x{n})"
        return dt

    trial(roll_long)   # compile + warm
    trial(roll_short)
    t_long = min(trial(roll_long) for _ in range(3))
    t_short = min(trial(roll_short) for _ in range(3))
    dt = t_long - t_short
    eff = steps - k_short
    if dt <= 0:
        dt, eff = t_long, steps
    return n * n * eff / dt / 1e6


def measure3d(n: int, steps: int, storage: str = "native",
              nz: int = 0) -> float:
    """3-D (D3Q19) fused-kernel step throughput at n x n x (nz or n),
    same timing design. Wide cross-sections route through the y-paneled
    kernel (kernels/fused_panel3d.py) automatically."""
    import jax
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig, PoissonSolver
    from lbm_tpu.models import plasma3d

    nz = nz or n
    cfg = dataclasses.replace(
        PlasmaConfig(), NX=n, NY=n, NZ=nz, nsteps=steps, dtype=jnp.float32,
        backend="fused", poisson=PoissonSolver.FFT, storage=storage,
        neutral_delta=(storage == "bf16"),
    )
    k_short = max(steps // 5, 1)
    roll_long = jax.jit(plasma3d.make_rollout(cfg, steps), donate_argnums=(0,))
    roll_short = jax.jit(plasma3d.make_rollout(cfg, k_short),
                         donate_argnums=(0,))

    # all floating leaves: the DDF coupling is one-way (f never reads g),
    # so an f-only check would miss a thermal blow-up entirely
    from lbm_tpu.utils.watchdog import finite_reduction
    finite = jax.jit(finite_reduction)

    def trial(roll):
        s = plasma3d.init_state(cfg)
        bool(finite(s))
        t0 = time.perf_counter()
        s = roll(s)
        ok = bool(finite(s))
        dt = time.perf_counter() - t0
        assert ok, f"non-finite 3-D state in benchmark window ({n}^3)"
        return dt

    trial(roll_long)
    trial(roll_short)
    t_long = min(trial(roll_long) for _ in range(3))
    t_short = min(trial(roll_short) for _ in range(3))
    dt = t_long - t_short
    eff = steps - k_short
    if dt <= 0:
        dt, eff = t_long, steps
    return n * n * nz * eff / dt / 1e6


def measure_plasma_multistep(n: int, steps: int, storage: str = "bf16",
                             solver: str = "NONE") -> float:
    """Temporally-blocked plasma throughput: K steps per kernel launch
    with the whole (f, g) state VMEM-resident
    (kernels/fused_multistep.py). solver="NONE" has no global stage (the
    reference's own benchmark CSV is dominated by NONE+Periodic rows; its
    200^2 rows work out to 0.55-1.1 MLUPS); solver="FFT" is the GOLDEN
    configuration (src/main_plasma.cpp:16-51) with the spectral solve
    running IN-KERNEL as MXU DFT matmuls each step."""
    import jax
    import jax.numpy as jnp

    from lbm_tpu.config import PlasmaConfig, PoissonSolver
    from lbm_tpu.models import plasma
    from lbm_tpu.utils.watchdog import finite_reduction

    cfg = dataclasses.replace(
        PlasmaConfig(), NX=n, NY=n, nsteps=steps, dtype=jnp.float32,
        poisson=PoissonSolver[solver], backend="fused", storage=storage,
        neutral_delta=(storage == "bf16"), multistep=256)
    k_short = max(steps // 5, 1)
    roll_long = jax.jit(plasma.make_rollout(cfg, steps), donate_argnums=(0,))
    roll_short = jax.jit(plasma.make_rollout(cfg, k_short),
                         donate_argnums=(0,))
    finite = jax.jit(finite_reduction)

    def trial(roll):
        s = plasma.init_state(cfg)
        bool(finite(s))
        t0 = time.perf_counter()
        s = roll(s)
        ok = bool(finite(s))
        dt = time.perf_counter() - t0
        assert ok, f"non-finite multistep state ({n}x{n})"
        return dt

    trial(roll_long)
    trial(roll_short)
    t_long = min(trial(roll_long) for _ in range(3))
    t_short = min(trial(roll_short) for _ in range(3))
    dt = t_long - t_short
    eff = steps - k_short
    if dt <= 0:
        dt, eff = t_long, steps
    return n * n * eff / dt / 1e6


def measure_cavity(n: int, steps: int, storage: str = "native",
                   lean: bool = False, multistep: int = 0) -> float:
    """Single-population D2Q9 lid-driven cavity at n x n — the reference's
    SECOND benchmarked workload (BASELINE.md cavity grid-scaling rows:
    1000^2 x 10k steps = 8,841 ms ~ 1,131 MLUPS on the authors' machine).
    Same long/short scan-timing design as measure(). Runs the fused
    Pallas backend when the grid admits it (NY divisible by 8; measured
    on v5e-1 at 1000^2-2048^2: f32 stored 6570-6872 MLUPS, f32 lean
    ~9000-9200, bf16 stored ~10500-11000, vs jnp's 4293/2335)."""
    import jax

    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity
    from lbm_tpu.utils.watchdog import finite_reduction

    on_cpu = jax.default_backend() == "cpu"
    backend = os.environ.get(
        "BENCH_CAVITY_BACKEND",
        "fused" if (n % 8 == 0 and not on_cpu) else "jnp")
    cfg = dataclasses.replace(CavityConfig(), NX=n, NY=n, nsteps=steps,
                              backend=backend, storage=storage,
                              lean_macros=lean and backend == "fused",
                              multistep=(multistep if backend == "fused"
                                         else 0))
    k_short = max(steps // 5, 1)
    roll_long = jax.jit(cavity.make_rollout(cfg, steps), donate_argnums=(0,))
    roll_short = jax.jit(cavity.make_rollout(cfg, k_short),
                         donate_argnums=(0,))
    finite = jax.jit(finite_reduction)

    def trial(roll):
        s = cavity.init_state(cfg)
        bool(finite(s))
        t0 = time.perf_counter()
        s = roll(s)
        ok = bool(finite(s))
        dt = time.perf_counter() - t0
        assert ok, f"non-finite cavity state in benchmark window ({n}x{n})"
        return dt

    trial(roll_long)
    trial(roll_short)
    t_long = min(trial(roll_long) for _ in range(3))
    t_short = min(trial(roll_short) for _ in range(3))
    dt = t_long - t_short
    eff = steps - k_short
    if dt <= 0:
        dt, eff = t_long, steps
    return n * n * eff / dt / 1e6


def _prior_extra_keys(root: str | None = None) -> set:
    """Extras keys captured numerically in ANY prior round's driver record
    (BENCH_r*.json at the repo root). Used to rotate the extras order:
    never-captured keys run first, so every perf family eventually lands
    in a driver capture instead of the same four rows winning each round
    (round-4 verdict item 2)."""
    import glob
    seen = set()
    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            with open(p) as fh:
                parsed = json.load(fh).get("parsed") or {}
            for k, v in (parsed.get("extra") or {}).items():
                if isinstance(v, (int, float)):
                    seen.add(k)
        except Exception:  # noqa: BLE001 - a bad record must not kill bench
            continue
    return seen


def _rotate_jobs(jobs, seen, flagship=()):
    """Order extras jobs [(key, family, fn, post), ...] for the run:
    flagship keys first (headline-class numbers that should appear in
    EVERY round's record, e.g. the BASELINE >=2,000-bar row), then
    never-captured keys interleaved round-robin across families (so a
    budget death after 3-4 extras still covers cavity, multistep AND
    3-D); previously-captured keys last, original order. Every job
    always appears exactly once — a family tag outside the preferred
    cycle degrades to "runs later", never "silently dropped"."""
    lead = [j for j in jobs if j[0] in flagship]
    jobs = [j for j in jobs if j[0] not in flagship]
    fresh = [j for j in jobs if j[0] not in seen]
    stale = [j for j in jobs if j[0] in seen]
    by_family = {}
    for j in fresh:
        by_family.setdefault(j[1], []).append(j)
    fam_cycle = ["cavity", "plasma_ms", "3d", "plasma"]
    fam_cycle += [f for f in by_family if f not in fam_cycle]
    ordered = []
    while any(by_family.get(f) for f in fam_cycle):
        for f in fam_cycle:
            if by_family.get(f):
                ordered.append(by_family[f].pop(0))
    return lead + ordered + stale


def _supervised_main() -> int:
    """Run the measurement in a child process and retry once on a crash.

    The axon TPU worker occasionally dies mid-run ("TPU worker process
    crashed or restarted") and the in-process jax runtime stays wedged —
    only a fresh process reconnects.

    Driver-proofing (round 4): the child prints a complete JSON line after
    the headline AND after every extra; the parent streams the child's
    stdout line-by-line (no buffering), so even if the parent itself is
    killed mid-extras the headline line is already on OUR stdout and the
    driver's last-parseable-line rule picks up whatever completed. The
    crash retry re-runs WITHOUT extras so its worst case is one headline
    measurement."""
    import json
    import subprocess
    import threading

    # a child that HANGS (axon tunnel degraded: even a trivial jit can
    # block forever in the remote compile helper) would stall the
    # streaming loop with no output at all — enforce a hard per-attempt
    # deadline from a watchdog thread. Attempt 2 is headline-only and
    # gets a shorter leash.
    timeouts = (float(os.environ.get("BENCH_CHILD_TIMEOUT_S", "2400")),
                float(os.environ.get("BENCH_RETRY_TIMEOUT_S", "900")))

    last = None
    rc = None
    for attempt in range(2):
        env = dict(os.environ, BENCH_CHILD="1")
        if attempt > 0:
            env["BENCH_SKIP_EXTRAS"] = "1"  # retry = headline only
        p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=subprocess.PIPE, text=True,
                             bufsize=1)
        assert p.stdout is not None
        killer = threading.Timer(timeouts[attempt], p.kill)
        killer.daemon = True
        killer.start()
        for ln in p.stdout:
            ln = ln.rstrip("\n")
            if ln.startswith("{"):
                last = ln
            print(ln, flush=True)  # stream through immediately
        rc = p.wait()
        killer.cancel()
        if rc == 0 and last:
            return 0
        sys.stderr.write(f"\nbench child attempt {attempt + 1} failed "
                         f"(rc={rc}); retrying headline-only in a fresh "
                         f"process\n")
    if last:
        return 0
    # total failure (device unavailable / both children hung): emit an
    # honest parseable line so the round's record says WHY there is no
    # number instead of an empty tail
    print(json.dumps({
        "metric": "plasma_mlups_2048x2048_fft_periodic_1chip_bf16",
        "value": 0.0, "unit": "MLUPS", "vs_baseline": 0.0,
        "error": f"no measurement: bench children produced no output "
                 f"(last rc={rc}; TPU tunnel hung or worker dead)",
    }), flush=True)
    return 1


def main() -> None:
    import jax

    t_start = time.perf_counter()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("BENCH_N", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    backend = os.environ.get("BENCH_BACKEND", "fused")
    # the headline tracks the engine's BEST mode (bf16 storage, the opt-in
    # fast path); the f32-native number rides in extra for continuity
    storage = os.environ.get("BENCH_STORAGE", "bf16")
    n_extra = int(os.environ.get("BENCH_N_EXTRA", "4096"))
    # wall-clock budget for the EXTRAS (seconds since process start): an
    # extra only starts while under budget; everything skipped is recorded.
    # Round 3's bench died rc=124 because ~15 extras each compiled fresh
    # kernels through the slow remote helper with no bound anywhere.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "720"))

    mlups = measure(n, steps, backend, storage)
    tag = "" if storage == "native" else f"_{storage}"
    out = {
        "metric": f"plasma_mlups_{n}x{n}_fft_periodic_1chip{tag}",
        "value": round(mlups, 2),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 1),
    }
    # the headline goes out IMMEDIATELY — a timeout mid-extras must never
    # cost the primary metric (the driver takes the last parseable line,
    # and every re-print below is a complete superset of this one)
    print(json.dumps(out), flush=True)
    if os.environ.get("BENCH_SKIP_EXTRAS"):
        return

    # extras: best-effort AND budget-bound. Each failure reports an error
    # string instead of killing the JSON line; each completion re-prints
    # the full updated line so a kill at ANY point leaves the maximum on
    # stdout. ORDER (round-5): jobs whose key was never captured in a
    # prior BENCH_r*.json run FIRST, round-robin across perf families
    # (cavity / plasma-multistep / 3-D / plasma), so every family gets a
    # driver-captured number at least once instead of the same four
    # plasma rows starving the tail each round; already-captured keys
    # re-run last as budget allows.
    extra = {}
    out["extra"] = extra

    def attempt(key, fn):
        if time.perf_counter() - t_start > budget_s:
            extra[key] = "skipped: budget"
            return
        try:
            extra[key] = round(fn(), 2)
        except Exception as e:  # noqa: BLE001 - report, don't die
            extra[key] = f"error: {type(e).__name__}: {e}"[:200]
        print(json.dumps(out), flush=True)

    jobs = []  # (key, family, fn, post)

    def add(key, family, fn, post=None):
        jobs.append((key, family, fn, post))

    other = "native" if storage == "bf16" else "bf16"
    if n_extra and n_extra != n:
        # the BASELINE target grid, both storage modes; short windows (the
        # golden parameters blow up fast at 4096^2 — and bf16 storage
        # shortens the window to ~10-12 steps, CLAUDE.md)
        def post_ratio():
            v = extra.get(f"plasma_mlups_{n_extra}x{n_extra}_bf16")
            if isinstance(v, float):
                extra[f"vs_baseline_{n_extra}_bf16"] = round(
                    v / BASELINE_MLUPS, 1)
        add(f"plasma_mlups_{n_extra}x{n_extra}_bf16", "plasma",
            lambda: measure(n_extra, 10, backend, "bf16"), post_ratio)
        add(f"plasma_mlups_{n_extra}x{n_extra}_native", "plasma",
            lambda: measure(n_extra, max(steps // 2, 10), backend, "native"))
        # the BASELINE grid with the NONE solver (a first-class reference
        # workload: poisson=0 rows throughout its scalability CSV). No
        # per-step rfft2 -> pure LBM roofline; measured 2,190 MLUPS bf16
        # on v5e (2026-08-20) = the >=2,000 BASELINE bar on ONE chip.
        add(f"plasma_mlups_{n_extra}x{n_extra}_none_periodic_bf16", "plasma",
            lambda: measure(n_extra, 10, backend, "bf16", "NONE"))
    add(f"plasma_mlups_{n}x{n}_{other}", "plasma",
        lambda: measure(n, steps, backend, other))
    on_cpu = jax.default_backend() == "cpu"
    ngit = int(os.environ.get("BENCH_PLASMA_GS_ITER", "256"))
    if ngit and not on_cpu:
        # the GS solver through the VMEM-resident per-step iterative
        # kernel (iter_engine="auto" -> kernels/poisson_iter.py on
        # hardware; measured 1.7-2.2x full GS/SOR steps, phi bitwise —
        # STATUS round-4 ledger; reference solver-ranking rows:
        # build/simulation_time_plasma_details.csv 100x100 poisson=1)
        add(f"plasma_mlups_{ngit}x{ngit}_gs_iter", "plasma",
            lambda: measure(ngit, 40, backend, "native", "GS"))
    ngms = int(os.environ.get("BENCH_PLASMA_GOLDEN_MULTISTEP", "200"))
    if ngms and not on_cpu:
        # the GOLDEN configuration (200^2, FFT + periodic) temporally
        # blocked with the spectral solve in-kernel (MXU DFT matmuls);
        # the reference's best run of this exact config is 0.99 MLUPS
        add(f"plasma_mlups_{ngms}x{ngms}_fft_multistep", "plasma_ms",
            lambda: measure_plasma_multistep(ngms, 10240, "native",
                                             solver="FFT"))
        add(f"plasma_mlups_{ngms}x{ngms}_fft_multistep_bf16", "plasma_ms",
            lambda: measure_plasma_multistep(ngms, 10240, "bf16",
                                             solver="FFT"))
    npms = int(os.environ.get("BENCH_PLASMA_MULTISTEP", "256"))
    if npms and not on_cpu:
        # plasma temporal blocking (NONE solver — the reference's own
        # most-benchmarked configuration; measured 2.4-3.3 GLUPS bf16 at
        # 200^2-256^2, STATUS)
        add(f"plasma_mlups_{npms}x{npms}_none_multistep_bf16", "plasma_ms",
            lambda: measure_plasma_multistep(npms, 10240, "bf16"))
    ncav = int(os.environ.get("BENCH_CAVITY", "1000"))
    if ncav:
        # the reference's second benchmarked workload; its own 1000^2 row
        # works out to ~1,131 MLUPS (BASELINE.md) — the one reference
        # number the plasma ratios don't cover
        # f32 in lean-macro mode: populations-only traffic (72 B/site),
        # Ghia errors identical to the stored-macro path (STATUS)
        add(f"cavity_mlups_{ncav}x{ncav}", "cavity",
            lambda: measure_cavity(ncav, 2000, lean=True))
        # bf16 delta storage (60 B/site; Ghia-identical accuracy) — the
        # cavity's own fast mode, fused backend only
        add(f"cavity_mlups_{ncav}x{ncav}_bf16", "cavity",
            lambda: measure_cavity(ncav, 2000, "bf16"))
    nbms = int(os.environ.get("BENCH_CAVITY_MULTISTEP_BANDED", "2048"))
    if nbms and not on_cpu:
        # BANDED temporal blocking: grids past the whole-grid VMEM budget
        # run K-deep-ghost row bands through the gated kernel
        # (make_rollout auto-picks it) — measured 14.5 GLUPS f32 (K=32) /
        # 17.9 GLUPS bf16 (K=16) at 2048^2 vs the per-step banded
        # kernels' 9.2 / 11.1 (STATUS round-3; bf16 halves the window
        # traffic so its optimum K is lower)
        add(f"cavity_mlups_{nbms}x{nbms}_multistep_banded", "cavity",
            lambda: measure_cavity(nbms, 2048, multistep=32))
        add(f"cavity_mlups_{nbms}x{nbms}_multistep_banded_bf16", "cavity",
            lambda: measure_cavity(nbms, 2048, "bf16", multistep=16))
    nms = int(os.environ.get("BENCH_CAVITY_MULTISTEP", "512"))
    if nms and not on_cpu:
        # temporal blocking: K steps per kernel launch, whole grid
        # VMEM-resident (the small-grid regime the banded kernels ran
        # launch-bound; measured 20-35 GLUPS at 128^2-512^2, STATUS)
        add(f"cavity_mlups_{nms}x{nms}_multistep", "cavity",
            lambda: measure_cavity(nms, 20000, multistep=256))
    n3d = int(os.environ.get("BENCH_N_3D", "128"))
    if n3d:
        # the 3-D D3Q19 fused kernel (bf16 storage: its fast mode)
        add(f"plasma3d_mlups_{n3d}^3_bf16", "3d",
            lambda: measure3d(n3d, max(steps // 2, 10), "bf16"))
    nw = int(os.environ.get("BENCH_3D_WIDE", "512"))
    if nw:
        # wide cross-section (y-paneled kernel); short window — the golden
        # instability grows with the seeded-box size
        add(f"plasma3d_mlups_{nw}x{nw}x64_bf16", "3d",
            lambda: measure3d(nw, 8, "bf16", nz=64))

    # flagship: the BASELINE >=2,000-MLUPS-bar row rides first in every
    # round's record (one ~90 s measurement; everything else rotates)
    flagship = (f"plasma_mlups_{n_extra}x{n_extra}_none_periodic_bf16",)
    for key, _family, fn, post in _rotate_jobs(jobs, _prior_extra_keys(),
                                               flagship):
        attempt(key, fn)
        if post is not None:
            post()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_supervised_main())
