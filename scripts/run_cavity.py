#!/usr/bin/env python
"""Lid-driven cavity driver with Ghia comparison and |u|^2 heatmap video.

The classic validation workload (old codes/LBM_classic): Re=100, 129^2,
u_lid=0.1, 10k steps, compared against Ghia et al. (1982) centerlines.

    python scripts/run_cavity.py [--nx 129] [--steps 10000] [--re 100]
                                 [--u-lid 0.1] [--video-every 100]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nx", type=int, default=129)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--u-lid", type=float, default=0.1)
    p.add_argument("--f64", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="build/output_cavity")
    p.add_argument("--video-every", type=int, default=100)
    p.add_argument("--no-video", action="store_true")
    p.add_argument("--stability-guard", action="store_true",
                   help="auto-resize grid if tau leaves [0.5, 2]")
    p.add_argument("--backend", choices=("jnp", "fused"), default="jnp",
                   help="fused = single-HBM-pass Pallas kernel "
                        "(needs NX divisible by 8; ~3x the jnp step on TPU)")
    p.add_argument("--storage", choices=("native", "bf16"), default="native",
                   help="bf16 = f stored as bfloat16 deviations from the "
                        "uniform background (60 B/site; Ghia errors "
                        "identical to f32, mass drift ~1e-4/10k steps)")
    p.add_argument("--lean", action="store_true",
                   help="fused backend: recompute macros in-register and "
                        "traffic populations only (f32: 72 B/site, Ghia "
                        "identical, ~9,200 MLUPS at 2048^2; bf16: 36 "
                        "B/site, ~17,900 MLUPS, Ghia u 5.5%% vs 2.5%% — "
                        "see docs/STATUS.md)")
    p.add_argument("--multistep", type=int, default=0, metavar="K",
                   help="fused backend, VMEM-resident grids (<=~512^2): "
                        "run K steps per kernel launch (temporal blocking "
                        "— zero HBM traffic between steps; lean "
                        "populations-only semantics)")
    p.add_argument("--shard", type=int, default=0, metavar="N",
                   help="row-shard the cavity over the first N devices "
                        "(fused halo kernels + ICI strips; needs NX "
                        "divisible by 8*N; ignores --backend)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="write <out>/ckpt_<step>.npz every N steps "
                        "(plus final_state.npz at the end)")
    p.add_argument("--resume", default="",
                   help="resume from a cavity .npz checkpoint (storage "
                        "layout reconciled to --storage)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.config import CavityConfig
    from lbm_tpu.io import colormap, timing, video
    from lbm_tpu.models import cavity

    # --shard runs the fused halo kernels regardless of --backend; --lean
    # and --multistep need backend="fused" to pass config validation
    backend = ("fused" if (args.lean or args.shard or args.multistep)
               else args.backend)
    # --shard + --multistep compose: K-deep ghost-row windows over the
    # mesh (parallel.fused_sharded.make_fused_sharded_cavity_multistep_rollout)
    cfg = CavityConfig(NX=args.nx, NY=args.nx, nsteps=args.steps,
                       u_lid=args.u_lid, Re=args.re,
                       dtype=jnp.float64 if args.f64 else jnp.float32,
                       backend=backend, storage=args.storage,
                       lean_macros=args.lean, multistep=args.multistep,
                       kernel_interpret=(backend == "fused" and args.cpu
                                         and not args.shard))
    if args.stability_guard:
        cfg = cfg.with_stability_guard()
    print(f"cavity: {cfg.NX}^2, tau={cfg.tau:.4f}, {cfg.nsteps} steps")

    from lbm_tpu.io import checkpoint as ckpt

    os.makedirs(args.out, exist_ok=True)
    state = cavity.init_state(cfg)
    start_step = 0
    if args.resume:
        state = ckpt.reconcile_cavity_state(
            ckpt.load_cavity(args.resume), args.resume, cfg)
        if tuple(state.rho.shape) != (cfg.NY, cfg.NX):
            raise SystemExit(
                f"--resume checkpoint grid {state.rho.shape} != run grid "
                f"({cfg.NY}, {cfg.NX}): pass the matching --nx (tau "
                f"depends on NY — a silent mismatch runs the wrong "
                f"Reynolds number)")
        start_step = int(state.step)
        print(f"resumed from {args.resume} at step {start_step}")
    if args.shard:
        from jax.sharding import Mesh

        from lbm_tpu.parallel.fused_sharded import \
            make_fused_sharded_cavity_step
        from lbm_tpu.parallel.mesh import AXIS_Y

        devs = jax.devices()
        if len(devs) < args.shard:
            raise SystemExit(f"--shard {args.shard}: only {len(devs)} "
                             f"devices available")
        mesh = Mesh(np.asarray(devs[:args.shard]), (AXIS_Y,))
        try:
            # under --multistep the march is windows-only (step unused;
            # the tail runs a remainder-length windowed rollout)
            step = (None if args.multistep
                    else make_fused_sharded_cavity_step(cfg, mesh))
        except ValueError as e:
            raise SystemExit(f"--shard: {e}")
        print(f"sharded over mesh {dict(mesh.shape)}")
    else:
        step = jax.jit(cavity.make_step(cfg), donate_argnums=(0,))

    writer = None
    if not args.no_video:
        from lbm_tpu.io.video import _open_writer
        writer = _open_writer(os.path.join(args.out, "cavity.avi"),
                              cfg.NX, cfg.NY, fps=10)

    @jax.jit
    def render(ux, uy):
        # |u|^2 heatmap with min-max normalization like the reference
        # (old codes/LBM_classic/LBM.cpp:192-236, PLASMA colormap there;
        # JET here — the capability is the video, not the palette)
        m = ux * ux + uy * uy
        lo, hi = m.min(), m.max()
        return colormap.jet((m - lo) / jnp.maximum(hi - lo, 1e-30))[::-1]

    # march in scan chunks between video frames: tiny grids are dispatch-
    # latency-bound if stepped one call at a time. Clamp to the remaining
    # trajectory so short runs don't compile an oversized rollout.
    remaining = max(cfg.nsteps - start_step, 0)
    chunk = max(1, min(args.video_every if not args.no_video else 500,
                       remaining))
    tail = None
    if args.shard:
        from lbm_tpu.parallel.fused_sharded import (
            make_fused_sharded_cavity_multistep_rollout,
            make_fused_sharded_cavity_rollout)

        # lean mode's reduced (f, step) scan carry lives inside the
        # rollout constructor; stored mode scans the full state there too
        maker = (make_fused_sharded_cavity_multistep_rollout
                 if args.multistep else make_fused_sharded_cavity_rollout)
        try:
            roll = maker(cfg, mesh, chunk)
            if args.multistep and remaining % chunk:
                tail = maker(cfg, mesh, remaining % chunk)
        except ValueError as e:
            raise SystemExit(f"--shard: {e}")
    else:
        roll = jax.jit(cavity.make_rollout(cfg, chunk), donate_argnums=(0,))
    roll(cavity.init_state(cfg))  # compile outside the timer

    def write_ckpt(st, name=None):
        path = os.path.join(args.out,
                            name or f"ckpt_{int(st.step):07d}.npz")
        ckpt.save_cavity(path, jax.device_get(st), storage=cfg.storage)
        return path

    timer = timing.StepTimer(cfg.NX, cfg.NY)
    timer.start()
    done = 0
    # nsteps is the TOTAL trajectory length: a resumed run does the rest
    target = max(cfg.nsteps - start_step, 0)
    next_ckpt = args.checkpoint_every or target + 1
    while done < target:
        if target - done >= chunk:
            state = roll(state)
            done += chunk
            timer.tick(chunk)
        elif tail is not None:
            # sharded multistep: the remainder runs as one windowed rollout
            k = target - done
            state = tail(state)
            done += k
            timer.tick(k)
        else:
            state = step(state)
            done += 1
            timer.tick()
        if writer is not None:
            writer.write(np.asarray(jax.device_get(render(state.ux, state.uy))))
        if args.checkpoint_every and done >= next_ckpt:
            print(f"checkpoint: {write_ckpt(state)}")
            next_ckpt += args.checkpoint_every
    float(state.ux[0, 0])  # sync
    if args.checkpoint_every:
        write_ckpt(state, "final_state.npz")
    wall_ms = timer.wall_s * 1000
    if writer is not None:
        writer.close()

    (yp, up), (xp, vp) = cavity.centerline_profiles(state, cfg.u_lid)
    np.savetxt(os.path.join(args.out, "centerline_u.csv"),
               np.column_stack([yp, up]), delimiter=",", header="y,u/u_lid")
    np.savetxt(os.path.join(args.out, "centerline_v.csv"),
               np.column_stack([xp, vp]), delimiter=",", header="x,v/u_lid")

    if cfg.NX == 129 and abs(cfg.Re - 100.0) < 1e-9:
        ug = np.interp(cavity.GHIA_Y, yp, up)
        vg = np.interp(cavity.GHIA_X, xp, vp)
        eu = np.abs(ug - cavity.GHIA_U_RE100).max()
        ev = np.abs(vg - cavity.GHIA_V_RE100).max()
        print(f"Ghia check: max|du|={eu:.4f}, max|dv|={ev:.4f}")

    timing.append_timing_csv(
        os.path.join(args.out, "simulation_time_details.csv"),
        NX=cfg.NX, NY=cfg.NY, nsteps=cfg.nsteps,
        n_devices=len(jax.devices()), poisson=-1, bc=-1, wall_ms=wall_ms)
    print(f"cavity done: {wall_ms:.0f} ms ({timer.mlups:.2f} MLUPS)")


if __name__ == "__main__":
    main()
