#!/usr/bin/env python
"""f32-vs-f64 drift at the golden configuration (200x200, 200 steps).

Measures, for every observable field, the max |f32 - f64| relative to the
field's f64 scale after the full golden run — once with the classic state
layout and once with the neutral delta storage (cfg.neutral_delta), which
rescues the neutral channel from the rho_n ~ 1.8e10 f32 cancellation
(docs/STATUS.md "fp32 vs fp64 drift"). The f64 truth runs the classic
layout (golden-trajectory parity is pinned to it by the C++ fixtures).

    python scripts/measure_drift.py [--tpu] [--steps 200]

CPU by default; --tpu times the fused kernel path on the real chip.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--tpu", action="store_true",
                   help="f32 runs use the fused kernel on the TPU "
                        "(f64 truth stays on CPU)")
    args = p.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    # x64 is flipped on ONLY for the f64 truth run (below): Pallas/Mosaic
    # does not lower TPU kernels traced under jax_enable_x64 (index plumbing
    # goes 64-bit), so the f32/bf16 TPU legs must trace with x64 off.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.models import plasma

    cpu = jax.devices("cpu")[0]

    def run(dtype, delta, backend="jnp", device=cpu, storage="native"):
        cfg = dataclasses.replace(
            PlasmaConfig(), NX=args.n, NY=args.n, nsteps=args.steps,
            dtype=dtype, neutral_delta=delta, backend=backend,
            storage=storage)
        with jax.default_device(device):
            s = plasma.init_state(cfg)
            step = jax.jit(plasma.make_step(cfg), donate_argnums=(0,))
            for _ in range(args.steps):
                s = step(s)
            mac = plasma.compute_macros(cfg, s)
            Ex, Ey = s.Ex, s.Ey
        return jax.device_get(
            dict(rho=mac.rho, ux=mac.ux, uy=mac.uy, T=mac.T,
                 rho_q=mac.rho_q, Ex=Ex, Ey=Ey))

    print(f"golden drift, {args.n}x{args.n}, {args.steps} steps", flush=True)
    f32_dev = jax.devices()[0] if args.tpu else cpu
    f32_backend = "fused" if args.tpu else "jnp"
    runs = {"classic": run(jnp.float32, False, f32_backend, f32_dev),
            "delta": run(jnp.float32, True, f32_backend, f32_dev),
            "bf16": run(jnp.float32, True, f32_backend, f32_dev,
                        storage="bf16")}

    jax.config.update("jax_enable_x64", True)  # f64 truth (CPU jnp) only
    truth = run(jnp.float64, delta=False)

    species = "ein"
    print(f"{'field':8s} {'classic-f32':>12s} {'delta-f32':>12s}"
          f" {'bf16-delta':>12s}   (max |err| / field scale)")
    for name in ("rho", "ux", "uy", "T"):
        for k, s in enumerate(species):
            t = np.asarray(truth[name][k], np.float64)
            scale = np.abs(t).max()
            errs = [np.abs(np.asarray(runs[m][name][k], np.float64) - t).max()
                    / scale for m in ("classic", "delta", "bf16")]
            print(f"{name}_{s:6s} {errs[0]:12.3e} {errs[1]:12.3e}"
                  f" {errs[2]:12.3e}")
    for name in ("rho_q", "Ex", "Ey"):
        t = np.asarray(truth[name], np.float64)
        scale = np.abs(t).max()
        errs = [np.abs(np.asarray(runs[m][name], np.float64) - t).max()
                / scale for m in ("classic", "delta", "bf16")]
        print(f"{name:8s} {errs[0]:12.3e} {errs[1]:12.3e} {errs[2]:12.3e}")


if __name__ == "__main__":
    main()
