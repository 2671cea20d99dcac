"""Measure the v5e roofline pieces in ONE session and break down the step.

Everything is scan-timed (K iterations inside one dispatch), synced by a
device->host scalar read, long/short-differenced to cancel the ~30 ms axon
tunnel latency, best-of-N. Prints a JSON dict:

  * hbm copy rates: XLA copy, XLA donated (in-place-able) copy, Pallas
    blocked copy, Pallas aliased copy   [GB/s, N_bytes/time convention]
  * fused kernel alone (collide+stream, no Poisson)  [ms/step, GB/s]
  * Poisson(FFT)+E alone                             [ms/step]
  * full plasma step                                 [ms/step, MLUPS]

Roofline: the fused kernel moves 2x S*Q*NY*NX*itemsize B per step (read
f+g, write f+g in place; itemsize 4, or 2 under BENCH_STORAGE=bf16). Its
speed-of-light is the best measured copy rate; MLUPS ceiling =
rate / (2 * 54 * itemsize B).

Env knobs: BENCH_N (grid, default 2048), BENCH_STEPS (window, default 50
— use ~10 at 4096^2 bf16, the golden instability blows up fast there),
BENCH_STORAGE (native|bf16).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_N", "2048")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lbm_tpu.config import PlasmaConfig
    from lbm_tpu.kernels.fused_step import collide_stream
    from lbm_tpu.models import plasma
    from lbm_tpu.models.plasma import _solve_poisson

    N = int(os.environ.get("BENCH_N", "2048"))
    K = int(os.environ.get("BENCH_STEPS", "50"))
    # BENCH_STORAGE=bf16 profiles the fast mode: populations cross HBM in
    # bfloat16 (216 B/site instead of 432) with delta-stored neutrals —
    # the same config bench.py's headline runs. The copy-rate probes stay
    # f32 (they characterize the chip, not the mode).
    storage = os.environ.get("BENCH_STORAGE", "native")
    itemsize = 2 if storage == "bf16" else 4
    results = {"N": N, "K": K, "storage": storage,
               "device": str(jax.devices()[0])}

    def sync(x):
        return float(jnp.ravel(x)[0])

    def timeit(make_arg, fn_long, fn_short, eff_iters):
        """best-of-3 of (long - short) seconds."""
        def trial(fn):
            a = make_arg()
            sync(a[0] if isinstance(a, tuple) else a)
            t0 = time.perf_counter()
            out = fn(a)
            sync(out[0] if isinstance(out, tuple) else out)
            return time.perf_counter() - t0
        trial(fn_long); trial(fn_short)
        tl = min(trial(fn_long) for _ in range(3))
        ts = min(trial(fn_short) for _ in range(3))
        dt = tl - ts
        if dt <= 0:
            dt = tl
            eff_iters = K
        return dt / eff_iters

    # ---- copy rates --------------------------------------------------------
    # shape mirrors one population array: (3, 9, N, N) f32
    shape = (3, 9, N, N)
    nbytes = 27 * N * N * 4
    kshort = max(K // 5, 1)

    def scan_copy(x, iters):
        def body(c, _):
            return c * 1.000000119 + 0.0, None   # force a real pass
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    copy_l = jax.jit(functools.partial(scan_copy, iters=K), donate_argnums=0)
    copy_s = jax.jit(functools.partial(scan_copy, iters=kshort), donate_argnums=0)
    mk = lambda: jnp.ones(shape, jnp.float32)
    t = timeit(mk, copy_l, copy_s, K - kshort)
    results["xla_copy_GBps"] = round(nbytes / t / 1e9, 1)

    # Pallas aliased copy (the kernel's data-movement skeleton):
    def pallas_copy(x):
        ty = 8
        nk = N // ty
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 1.000000119
        return pl.pallas_call(
            kern,
            grid=(nk,),
            in_specs=[pl.BlockSpec((3, 9, ty, N), lambda k: (0, 0, k, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, 9, ty, N), lambda k: (0, 0, k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    def scan_pallas(x, iters):
        def body(c, _):
            return pallas_copy(c), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    pc_l = jax.jit(functools.partial(scan_pallas, iters=K), donate_argnums=0)
    pc_s = jax.jit(functools.partial(scan_pallas, iters=kshort), donate_argnums=0)
    t = timeit(mk, pc_l, pc_s, K - kshort)
    results["pallas_aliased_copy_GBps"] = round(nbytes / t / 1e9, 1)

    # ---- fused kernel alone ------------------------------------------------
    cfg = dataclasses.replace(PlasmaConfig(), NX=N, NY=N, dtype=jnp.float32,
                              backend="fused", storage=storage,
                              neutral_delta=(storage == "bf16"))
    u = cfg.units()
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb,
                neutral_ref=(u.rho_n_init if cfg.neutral_delta else 0.0))

    def scan_kernel(state, iters):
        def body(c, _):
            f, g, rq = collide_stream(c[0], c[1], c[2], c[3], **phys)
            return (f, g, c[2], c[3]), None
        out, _ = jax.lax.scan(body, state, None, length=iters)
        return out

    def mk_state():
        s = plasma.init_state(cfg)
        return (s.f, s.g, s.Ex, s.Ey)

    kl = jax.jit(functools.partial(scan_kernel, iters=K), donate_argnums=0)
    ks = jax.jit(functools.partial(scan_kernel, iters=kshort), donate_argnums=0)
    t = timeit(mk_state, kl, ks, K - kshort)
    # read f+g, write f+g, at the STORAGE itemsize (bf16 halves the bytes)
    kernel_bytes = 2 * 2 * 27 * N * N * itemsize
    results["fused_kernel_ms"] = round(t * 1e3, 3)
    results["fused_kernel_GBps_total_traffic"] = round(kernel_bytes / t / 1e9, 1)
    results["fused_kernel_mlups"] = round(N * N / t / 1e6, 1)

    # ---- Poisson + E alone --------------------------------------------------
    # rho_q must be loop-carried real data: a closed-over constant (or
    # zeros) lets XLA constant-fold the whole FFT and report ~0 ms.
    def scan_poisson(args, iters):
        rho_q, phi, Ex, Ey = args
        def body(c, _):
            rho_q, phi, Ex, Ey = c
            Ex, Ey, phi = _solve_poisson(cfg, rho_q, phi, Ex, Ey)
            return (rho_q * 0.999999, phi, Ex, Ey), None
        out, _ = jax.lax.scan(body, (rho_q, phi, Ex, Ey), None, length=iters)
        return out

    def mk_p():
        s = plasma.init_state(cfg)
        rq = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32)
        return (rq, s.phi, s.Ex, s.Ey)

    pll = jax.jit(functools.partial(scan_poisson, iters=K), donate_argnums=0)
    pls = jax.jit(functools.partial(scan_poisson, iters=kshort),
                  donate_argnums=0)
    t = timeit(mk_p, pll, pls, K - kshort)
    results["poisson_fft_ms"] = round(t * 1e3, 3)

    # ---- full step -----------------------------------------------------------
    roll_l = jax.jit(plasma.make_rollout(cfg, K), donate_argnums=(0,))
    roll_s = jax.jit(plasma.make_rollout(cfg, kshort), donate_argnums=(0,))

    def mk_full():
        return plasma.init_state(cfg)

    def timeit_state(roll):
        s = mk_full()
        sync(s.f)
        t0 = time.perf_counter()
        s = roll(s)
        v = sync(s.f)
        assert v == v
        return time.perf_counter() - t0
    timeit_state(roll_l); timeit_state(roll_s)
    tl = min(timeit_state(roll_l) for _ in range(3))
    ts = min(timeit_state(roll_s) for _ in range(3))
    t = (tl - ts) / (K - kshort)
    results["full_step_ms"] = round(t * 1e3, 3)
    results["full_step_mlups"] = round(N * N / t / 1e6, 1)

    # ---- roofline ------------------------------------------------------------
    # best_copy counts N_bytes/time for a copy (each byte read+written), so
    # total-traffic speed-of-light = 2*best_copy; the kernel moves 432 B/site
    # (read f+g + write f+g in place: 2 * 54 planes * 4 B).
    best_copy = max(results["xla_copy_GBps"], results["pallas_aliased_copy_GBps"])
    bytes_per_site = 2 * 2 * 27 * itemsize
    results["roofline_mlups_kernel_only"] = round(
        best_copy * 2e9 / bytes_per_site / 1e6, 1)
    sol_step_ms = (N * N * bytes_per_site / (2 * best_copy * 1e9)
                   + results["poisson_fft_ms"] / 1e3) * 1e3
    results["roofline_mlups_full_step"] = round(N * N / sol_step_ms / 1e3, 1)
    results["pct_of_full_step_roofline"] = round(
        100 * results["full_step_mlups"] / results["roofline_mlups_full_step"], 1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
