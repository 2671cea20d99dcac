import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses, time, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
storage = sys.argv[2] if len(sys.argv) > 2 else "native"
base = dict(NX=N, NY=N, dtype=jnp.float32, poisson=PoissonSolver.FFT,
            bc=BC.PERIODIC, neutral_delta=True, storage=storage)

# correctness: 40 steps per-step fused vs multistep K=8
cfgp = dataclasses.replace(PlasmaConfig(), **base, backend="fused")
cfgm = dataclasses.replace(PlasmaConfig(), **base, backend="fused", multistep=8)
s0 = plasma.init_state(cfgp)
ref = jax.jit(plasma.make_rollout(cfgp, 40))(s0)
s = jax.jit(plasma.make_rollout(cfgm, 40))(plasma.init_state(cfgm))
for name in ("f", "g", "Ex", "Ey", "phi"):
    a = np.asarray(getattr(ref, name), np.float32)
    b = np.asarray(getattr(s, name), np.float32)
    sc = max(np.abs(a).max(), 1e-30)
    fin = np.isfinite(b).all()
    print(f"{name}: scale={sc:.3e} maxrel={np.abs(a-b).max()/sc:.3e} finite={fin}")

# timing: K=256 windows, 10240 steps
steps = 10240
cfgt = dataclasses.replace(PlasmaConfig(), **base, backend="fused", multistep=256)
roll = jax.jit(plasma.make_rollout(cfgt, steps))
short = jax.jit(plasma.make_rollout(cfgt, 256))
best = None
for trial in range(3):
    st = plasma.init_state(cfgt)
    r = roll(st); _ = float(np.asarray(r.f[0, 0, 0, 0], np.float32))  # warm+sync
    st = plasma.init_state(cfgt)
    t0 = time.perf_counter(); r1 = short(st); _ = float(np.asarray(r1.f[0,0,0,0], np.float32)); t1 = time.perf_counter()
    st = plasma.init_state(cfgt)
    t2 = time.perf_counter(); r2 = roll(st); _ = float(np.asarray(r2.f[0,0,0,0], np.float32)); t3 = time.perf_counter()
    assert np.isfinite(np.asarray(r2.Ex, np.float32)).all()
    dt = (t3 - t2) - (t1 - t0)
    mlups = N * N * (steps - 256) / dt / 1e6
    print(f"trial {trial}: {dt*1e3:.1f} ms for {steps-256} steps = {mlups:.0f} MLUPS")
    best = max(best or 0, mlups)
print(f"BEST {N}x{N} {storage}: {best:.0f} MLUPS")
