#!/usr/bin/env python
"""Plasma simulation driver — the reference's main_plasma.cpp as a real CLI.

Runs the three-population plasma with probes, on-device video rendering,
timing CSV, optional checkpoints and the small-grid debug-dump harness.

Examples:
    python scripts/run_plasma.py                      # golden 200x200/200
    python scripts/run_plasma.py --preset 1024        # 1024^2 single chip
    python scripts/run_plasma.py --nx 64 --ny 64 --steps 50 --poisson SOR
    python scripts/run_plasma.py --backend pallas --no-video
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=["golden", "1024", "4096"],
                   default="golden")
    p.add_argument("--nx", type=int)
    p.add_argument("--ny", type=int)
    p.add_argument("--steps", type=int)
    p.add_argument("--poisson", choices=["NONE", "GS", "SOR", "FFT", "NPS"])
    p.add_argument("--bc", choices=["periodic", "bounceback"])
    p.add_argument("--omega-sor", type=float)
    p.add_argument("--backend", choices=["jnp", "pallas", "fused"], default="fused")
    p.add_argument("--neutral-delta", dest="neutral_delta",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="store neutral populations as deltas from the "
                        "uniform background (rescues the f32 neutral "
                        "channel; default: on for f32, off for f64)")
    p.add_argument("--storage", choices=["native", "bf16"], default="native",
                   help="population storage precision: bf16 halves the "
                        "dominant HBM traffic (~1.5x throughput) at ~1e-2 "
                        "macroscopic drift; arithmetic stays f32 (jnp/fused "
                        "backends)")
    p.add_argument("--f64", action="store_true",
                   help="float64 parity mode (CPU)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--out", default="build/output")
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--video-every", type=int, default=1)
    p.add_argument("--multistep", type=int, default=0, metavar="K",
                   help="temporal blocking: K whole steps per kernel "
                        "launch with the grid VMEM-resident (fused "
                        "backend, <=~256^2 f32; every solver/BC "
                        "combination — FFT+periodic solves in-kernel via "
                        "MXU DFT matmuls, GS/SOR/NPS sweep in-kernel). "
                        "Probes, video, watchdog and checkpoints then "
                        "sample at WINDOW boundaries (every K steps) "
                        "instead of every step — use the default per-step "
                        "marching when the reference's per-step probe "
                        "series is the point")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--assume-ckpt-layout", choices=["classic", "delta"],
                   default=None,
                   help="declare the neutral-population layout of a "
                        "pre-metadata checkpoint (newer checkpoints record "
                        "it and don't need this)")
    p.add_argument("--debug-dump", action="store_true",
                   help="per-stage grid dumps on small grids (NX<11) in the "
                        "C++ debug build's exact format (all 5 pipeline "
                        "stages every step); runs the staged jnp step")
    p.add_argument("--debug-variant", action="store_true",
                   help="replicate the 'Plasma debug' predecessor build "
                        "(guard values, step-0 E pulse, true periodic "
                        "iterative sweeps) — the configuration of the C++ "
                        "debug_dump fixtures, for diffing --debug-dump "
                        "output against the reference debug build")
    p.add_argument("--watchdog-every", type=int, default=100,
                   help="NaN-watchdog cadence in steps (0 = off)")
    p.add_argument("--shard", type=int, default=0, metavar="N",
                   help="shard the lattice over the first N devices via "
                        "parallel.fused_sharded.make_fused_sharded_step_"
                        "auto (1-D fused halos -> 2-D fused -> GSPMD, "
                        "picked from grid shape/BC/solver; ignores "
                        "--backend on the fused paths)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace to this directory")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.backend != "jnp" and not args.multistep:
            # Pallas kernels only run in (slow) interpret mode on CPU; the
            # XLA path is the right CPU backend. (--multistep has no jnp
            # equivalent and runs interpret-mode kernels instead.)
            print(f"--cpu: backend '{args.backend}' needs a TPU, using 'jnp'")
            args.backend = "jnp"
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    if not args.cpu:
        # persistent cache entries are TPU-host specific; skip on CPU runs
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from lbm_tpu import config as C
    from lbm_tpu.io import checkpoint as ckpt
    from lbm_tpu.io import debug_dump, probes, timing, video
    from lbm_tpu.models import plasma

    cfg = {
        "golden": C.preset_golden_plasma(),
        "1024": C.preset_plasma_1024(),
        "4096": C.preset_plasma_4096(),
    }[args.preset]

    over = {}
    if args.nx: over["NX"] = args.nx
    if args.ny: over["NY"] = args.ny
    if args.steps: over["nsteps"] = args.steps
    if args.poisson: over["poisson"] = C.PoissonSolver[args.poisson]
    if args.bc: over["bc"] = (C.BC.PERIODIC if args.bc == "periodic"
                              else C.BC.BOUNCE_BACK)
    if args.omega_sor: over["omega_sor"] = args.omega_sor
    over["backend"] = args.backend
    over["dtype"] = jnp.float64 if args.f64 else jnp.float32
    # delta storage is an accuracy win in f32 (docs/STATUS.md drift table);
    # f64 defaults to the classic layout for bitwise golden parity
    over["neutral_delta"] = (args.neutral_delta if args.neutral_delta
                             is not None else not args.f64)
    if args.storage != "native":
        if args.f64:
            raise SystemExit("--storage bf16 is an f32 fast mode (drop --f64)")
        over["storage"] = args.storage
    if args.debug_variant:
        # the C++ debug build's behavior set (tests/test_reference_parity.py)
        over["compat"] = C.CompatFlags(
            none_solver_kills_external_field=False,
            dirichlet_iterative_under_periodic=False,
            debug_variant=True)
        over["backend"] = "jnp"  # debug_variant mode is jnp-backend only
    if args.multistep:
        if args.debug_dump or args.debug_variant:
            raise SystemExit("--multistep fuses whole windows; per-step/"
                             "per-stage dumps need per-step marching")
        over["multistep"] = args.multistep
        over["backend"] = "fused"
        if args.cpu:
            # the fused kernels cannot lower on CPU; interpret mode keeps
            # the CLI testable there (slow — real runs are TPU)
            over["kernel_interpret"] = True
    try:
        cfg = dataclasses.replace(cfg, **over)
    except ValueError as e:
        raise SystemExit(str(e))

    os.makedirs(args.out, exist_ok=True)
    state = (ckpt.load(args.resume, dtype=cfg.dtype) if args.resume
             else plasma.init_state(cfg))
    if args.resume:
        # layout + dtype reconciliation (refuses pre-metadata checkpoints
        # without --assume-ckpt-layout; see io/checkpoint.py)
        try:
            state = ckpt.reconcile_resumed_state(
                state, args.resume, cfg,
                assume_layout=args.assume_ckpt_layout)
        except ValueError as e:
            raise SystemExit(f"--resume: {e}")
    rec = probes.ProbeRecorder(cfg.NX, cfg.NY)
    vid = None
    if not args.no_video:
        vid = video.VideoRecorder(os.path.join(args.out, "video"),
                                  cfg.NX, cfg.NY)
    dmp = staged = None
    if args.debug_dump:
        dmp = debug_dump.DebugDumper(
            cfg, os.path.join(args.out, "debug_dump.txt"))
        if dmp.enabled:
            # per-stage dumps need the stage-granular step (the production
            # step fuses the pipeline); tiny grids only, speed irrelevant
            from lbm_tpu.models import plasma_staged
            staged = plasma_staged.make_staged_step(cfg)
            feq = plasma_staged.init_feq(cfg)
    step = None
    if staged is None and args.shard and cfg.multistep:
        # temporal blocking over the mesh: K-deep ghost-row windows
        # (NONE + periodic only — the sharded solvers run per-step)
        import numpy as np
        from jax.sharding import Mesh

        from lbm_tpu.parallel.fused_sharded import \
            make_fused_sharded_multistep_rollout
        from lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y

        devs = jax.devices()
        if len(devs) < args.shard:
            raise SystemExit(f"--shard {args.shard}: only {len(devs)} "
                             f"devices available")
        mesh = Mesh(np.asarray(devs[:args.shard]).reshape(args.shard, 1),
                    (AXIS_Y, AXIS_X))
        try:
            step = make_fused_sharded_multistep_rollout(
                cfg, mesh, cfg.multistep)
            rem_n = max(cfg.nsteps - int(state.step), 0) % cfg.multistep
            step_rem = (make_fused_sharded_multistep_rollout(
                cfg, mesh, rem_n) if rem_n else None)
        except ValueError as e:
            raise SystemExit(f"--shard --multistep: {e}")
        print(f"sharded multistep over mesh {dict(mesh.shape)}")
        step(plasma.init_state(cfg))  # compile outside the timer
    elif staged is None and args.shard:
        from lbm_tpu.parallel.fused_sharded import \
            make_fused_sharded_step_auto

        devs = jax.devices()
        if len(devs) < args.shard:
            raise SystemExit(f"--shard {args.shard}: only {len(devs)} "
                             f"devices available")
        try:
            step, mesh, shardings = make_fused_sharded_step_auto(
                cfg, devs[:args.shard])
        except ValueError as e:
            raise SystemExit(f"--shard: {e}")
        print(f"sharded over mesh {dict(mesh.shape)}")
        state = jax.tree.map(jax.device_put, state, shardings)
        step(jax.tree.map(jax.device_put, plasma.init_state(cfg),
                          shardings))  # compile outside the timer
    elif staged is None and cfg.multistep:
        # temporally-blocked windows: K steps per kernel launch; a second
        # compiled remainder window covers nsteps % K
        step = (jax.jit(plasma.make_rollout(cfg, cfg.multistep),
                        donate_argnums=(0,)).lower(state).compile())
        rem_n = max(cfg.nsteps - int(state.step), 0) % cfg.multistep
        step_rem = (jax.jit(plasma.make_rollout(cfg, rem_n),
                            donate_argnums=(0,)).lower(state).compile()
                    if rem_n else None)
    elif staged is None:
        # AOT-compile so the timer measures simulation, not compilation
        step = (jax.jit(plasma.make_step(cfg), donate_argnums=(0,))
                .lower(state).compile())

    from lbm_tpu.utils.watchdog import Watchdog
    wd = (Watchdog(every=args.watchdog_every)
          if args.watchdog_every else None)

    def with_fresh_phi(s):
        # the pallas FFT engine never materializes phi; store the solve of
        # the CURRENT rho_q instead (one step ahead of the stored E — the
        # exact warm start a resume's first solve reproduces, see
        # plasma.reconstruct_phi)
        if (cfg.poisson == C.PoissonSolver.FFT and cfg.bc == C.BC.PERIODIC
                and plasma._use_pallas_fft(cfg, (cfg.NY, cfg.NX))):
            return s._replace(phi=plasma.reconstruct_phi(cfg, s))
        return s
    if args.profile:
        jax.profiler.start_trace(args.profile)

    timer = timing.StepTimer(cfg.NX, cfg.NY)
    timer.start()
    start_step = int(state.step)
    if start_step >= cfg.nsteps:
        # --steps is an ABSOLUTE target (resume continues toward it)
        print(f"resume: checkpoint already at step {start_step} >= "
              f"--steps {cfg.nsteps}; nothing to run (raise --steps to "
              f"continue further)")
    stride = cfg.multistep or 1
    for t in range(start_step, cfg.nsteps, stride):
        k = min(stride, cfg.nsteps - t)
        # Reference alignment: the reference samples the macros computed at
        # the TOP of iteration t (pre-collide, src/main_plasma.cpp loop), so
        # compute them from the pre-step state; Ex/Ey are the post-Poisson
        # fields of the same iteration, which live on the post-step state.
        # Under --multistep the sampling happens once per WINDOW.
        if staged is not None:
            state, feq, stages = staged(state, feq)
            mac = stages["UpdateMacro"].mac
            for stage in plasma_staged.STAGES:
                dmp.dump_stage(t, stage, stages[stage])
        else:
            mac = plasma.compute_macros(cfg, state)
            state = step(state) if k == stride else step_rem(state)
        timer.tick(k)  # k lattice updates this window (k=1 per-step)
        if wd is not None:
            state = wd.check(t, state)
        rec.record(mac, state.Ex, state.Ey)
        if vid is not None and args.video_every and t % args.video_every == 0:
            vid.record(mac)
        if args.checkpoint_every and (t + k) % args.checkpoint_every == 0:
            ckpt.save(os.path.join(args.out, f"ckpt_{t+k:06d}.npz"),
                      with_fresh_phi(state),
                      neutral_delta=cfg.neutral_delta, storage=cfg.storage)
    jax.block_until_ready(state)
    # real sync (see bench.py note about block_until_ready under axon)
    float(state.f[0, 0, 0, 0])
    wall_ms = timer.wall_s * 1000
    if args.profile:
        jax.profiler.stop_trace()

    if vid is not None:
        vid.close()
    if dmp is not None:
        dmp.close()
    rec.save_csv(os.path.join(args.out, "graphs"))
    if not args.no_plots:
        rec.save_plots(os.path.join(args.out, "graphs"))
    ckpt.save(os.path.join(args.out, "final_state.npz"), with_fresh_phi(state),
              neutral_delta=cfg.neutral_delta, storage=cfg.storage)

    timing.append_timing_csv(
        os.path.join(args.out, "simulation_time_plasma_details.csv"),
        NX=cfg.NX, NY=cfg.NY, nsteps=cfg.nsteps - start_step,
        n_devices=len(jax.devices()),
        poisson=cfg.poisson.value, bc=cfg.bc.value, wall_ms=wall_ms)

    print(f"Simulation ended: {cfg.NX}x{cfg.NY}, {cfg.nsteps - start_step} steps, "
          f"{wall_ms:.0f} ms ({timer.mlups:.2f} MLUPS)")


if __name__ == "__main__":
    main()
