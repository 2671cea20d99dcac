#!/usr/bin/env python
"""D3Q19 3-D plasma column driver (BASELINE config #5).

    python scripts/run_plasma3d.py [--n 64] [--nz 64] [--steps 50]
                                   [--poisson FFT|NONE] [--slice-every 10]

Writes mid-plane slice snapshots (density/charge heatmaps at z = NZ/2) and
the timing CSV row.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--nz", type=int, default=64)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--poisson", choices=["FFT", "NONE"], default="FFT")
    p.add_argument("--slice-every", type=int, default=10)
    p.add_argument("--backend", choices=["jnp", "fused"], default="fused",
                   help="fused = 3-D Pallas kernel (TPU; auto-falls back "
                        "to jnp when the z-slice exceeds VMEM)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--storage", choices=["native", "bf16"], default="native",
                   help="population storage precision (bf16: half the HBM "
                        "bytes; arithmetic stays f32; implies neutral "
                        "delta storage)")
    p.add_argument("--neutral-delta", dest="neutral_delta",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="store neutral populations as deltas from the "
                        "uniform background (default: on for f32)")
    p.add_argument("--multistep", type=int, default=0, metavar="K",
                   help="multi-chip temporal blocking (requires --shard N "
                        "and --poisson NONE): K-deep ghost z-slab windows "
                        "over a 1-D dz mesh, one neighbor exchange per K "
                        "steps (parallel.fused_sharded.make_fused_sharded_"
                        "multistep_rollout_3d); slices/checkpoints sample "
                        "at window boundaries")
    p.add_argument("--shard", type=int, default=0, metavar="N",
                   help="shard the lattice over the first N devices via "
                        "parallel.fused_sharded.make_fused_sharded_step3d_"
                        "auto (z / y / (dz, dy) decomposition picked from "
                        "grid shape + per-shard VMEM feasibility; ignores "
                        "--backend — the sharded path always runs the "
                        "fused kernels)")
    p.add_argument("--out", default="build/output_3d")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--assume-ckpt-layout", choices=["classic", "delta"],
                   default=None,
                   help="declare the neutral layout of a pre-metadata "
                        "checkpoint (newer checkpoints record it)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    if not args.cpu:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))

    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.config import PlasmaConfig, PoissonSolver
    from lbm_tpu.io import timing
    from lbm_tpu.models import plasma3d

    if args.cpu and args.backend != "jnp" and not args.shard:
        print("--cpu: backend 'fused' needs a TPU, using 'jnp'")
        args.backend = "jnp"
    if args.storage == "bf16" and args.f64:
        raise SystemExit("--storage bf16 is an f32 fast mode (drop --f64)")
    if args.multistep:
        # 3-D temporal blocking is the multi-chip K-slab ghost protocol
        # only (models/plasma3d rejects single-device multistep: the
        # per-step kernel is already one HBM pass, nothing to amortize)
        if not args.shard:
            raise SystemExit("--multistep is multi-chip only in 3-D: add "
                             "--shard N")
        if args.poisson != "NONE":
            raise SystemExit("--multistep (3-D) needs --poisson NONE "
                             "(window-constant E; FFT is a global "
                             "per-step solve)")
        args.backend = "fused"
    try:
        cfg = dataclasses.replace(
            PlasmaConfig(), NX=args.n, NY=args.n, NZ=args.nz,
            nsteps=args.steps,
            poisson=PoissonSolver[args.poisson], backend=args.backend,
            dtype=jnp.float64 if args.f64 else jnp.float32,
            storage=args.storage, multistep=args.multistep,
            kernel_interpret=bool(args.multistep and args.cpu),
            neutral_delta=(args.neutral_delta
                           if args.neutral_delta is not None
                           else not args.f64))
    except ValueError as e:
        raise SystemExit(str(e))
    os.makedirs(args.out, exist_ok=True)

    from lbm_tpu.io import checkpoint as ckpt

    if args.resume:
        try:
            state = ckpt.reconcile_resumed_state(
                ckpt.load3d(args.resume, dtype=cfg.dtype), args.resume, cfg,
                assume_layout=args.assume_ckpt_layout)
        except ValueError as e:
            raise SystemExit(f"--resume: {e}")
    else:
        state = plasma3d.init_state(cfg)
    step_rem = None
    if args.shard and cfg.multistep:
        # multi-chip temporal blocking: K-deep ghost z-slab windows over a
        # 1-D dz mesh (+ a second compiled remainder window)
        from jax.sharding import Mesh

        from lbm_tpu.parallel.fused_sharded import (
            AXIS_Z, make_fused_sharded_multistep_rollout_3d)

        devs = jax.devices()
        if len(devs) < args.shard:
            raise SystemExit(f"--shard {args.shard}: only {len(devs)} "
                             f"devices available")
        mesh = Mesh(np.asarray(devs[:args.shard]).reshape(args.shard),
                    (AXIS_Z,))
        try:
            step = make_fused_sharded_multistep_rollout_3d(
                cfg, mesh, cfg.multistep)
            rem_n = max(cfg.nsteps - int(state.step), 0) % cfg.multistep
            step_rem = (make_fused_sharded_multistep_rollout_3d(
                cfg, mesh, rem_n) if rem_n else None)
        except ValueError as e:
            raise SystemExit(f"--shard --multistep: {e}")
        print(f"sharded 3-D multistep (K={cfg.multistep}-slab ghosts) "
              f"over {args.shard}-device dz mesh")
        step(plasma3d.init_state(cfg))  # compile outside timer
    elif args.shard:
        from lbm_tpu.parallel.fused_sharded import \
            make_fused_sharded_step3d_auto

        devs = jax.devices()
        if len(devs) < args.shard:
            raise SystemExit(f"--shard {args.shard}: only {len(devs)} "
                             f"devices available")
        try:
            step, mesh, shardings = make_fused_sharded_step3d_auto(
                cfg, devs[:args.shard])
        except ValueError as e:
            raise SystemExit(f"--shard: {e}")
        print(f"sharded over mesh {dict(mesh.shape)}")
        state = jax.tree.map(jax.device_put, state, shardings)
        step(jax.tree.map(jax.device_put, plasma3d.init_state(cfg),
                          shardings))  # compile outside timer
    else:
        step = jax.jit(plasma3d.make_step(cfg), donate_argnums=(0,))
        step(plasma3d.init_state(cfg))  # compile outside timer

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    timer = timing.StepTimer(cfg.NX, cfg.NY * cfg.NZ)
    timer.start()
    start_step = int(state.step)
    if start_step >= cfg.nsteps:
        # --steps is an ABSOLUTE target (resume continues toward it)
        print(f"resume: checkpoint already at step {start_step} >= "
              f"--steps {cfg.nsteps}; nothing to run (raise --steps to "
              f"continue further)")
    stride = cfg.multistep or 1
    for t in range(start_step, cfg.nsteps, stride):
        # under --multistep, observation lands on window boundaries (the
        # 2-D CLI's documented sampling contract)
        k = min(stride, cfg.nsteps - t)
        state = step(state) if k == stride else step_rem(state)
        timer.tick(k)
        if args.checkpoint_every and (t + k) % args.checkpoint_every == 0:
            ckpt.save3d(os.path.join(args.out, f"ckpt_{t+k:06d}.npz"), state,
                        neutral_delta=cfg.neutral_delta, storage=cfg.storage)
        if args.slice_every and (t + k) % args.slice_every == 0:
            u = cfg.units()
            # observation honors the storage/delta contracts: upcast bf16
            # populations (moments/rho_q are near-cancellations) and pass
            # neutral_ref so delta-stored neutrals read as full densities
            mac = plasma3d.update_macro(
                state.f.astype(cfg.dtype), state.g.astype(cfg.dtype),
                state.Ex, state.Ey, state.Ez,
                q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)
            zmid = cfg.NZ // 2
            fig, axes = plt.subplots(1, 2, figsize=(9, 4), dpi=100)
            im = axes[0].imshow(np.asarray(mac.rho[0][zmid]), origin="lower")
            fig.colorbar(im, ax=axes[0], label="rho_e")
            im = axes[1].imshow(np.asarray(mac.rho_q[zmid]), origin="lower",
                                cmap="RdBu_r")
            fig.colorbar(im, ax=axes[1], label="rho_q")
            fig.suptitle(f"z-midplane, step {t + k}")
            fig.tight_layout()
            fig.savefig(os.path.join(args.out, f"slice_{t + k:05d}.png"))
            plt.close(fig)
    float(state.f[0, 0, 0, 0, 0])  # sync
    wall_ms = timer.wall_s * 1000
    ckpt.save3d(os.path.join(args.out, "final_state.npz"), state,
                neutral_delta=cfg.neutral_delta, storage=cfg.storage)

    timing.append_timing_csv(
        os.path.join(args.out, "simulation_time_3d.csv"),
        NX=cfg.NX, NY=cfg.NY * cfg.NZ, nsteps=cfg.nsteps - start_step,
        n_devices=len(jax.devices()), poisson=cfg.poisson.value, bc=0,
        wall_ms=wall_ms)
    print(f"3D column done: {cfg.NX}^2x{cfg.NZ}, "
          f"{cfg.nsteps - start_step} steps, "
          f"{wall_ms:.0f} ms ({timer.mlups:.1f} MLUPS)")


if __name__ == "__main__":
    main()
