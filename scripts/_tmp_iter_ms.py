import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import dataclasses, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from lbm_tpu.config import BC, PlasmaConfig, PoissonSolver
from lbm_tpu.models import plasma

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
sol = sys.argv[2] if len(sys.argv) > 2 else "GS"
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100
base = dict(NX=N, NY=N, dtype=jnp.float32, poisson=PoissonSolver[sol],
            bc=BC.PERIODIC, neutral_delta=True, poisson_max_iter=iters)

cfgp = dataclasses.replace(PlasmaConfig(), **base, backend="fused")
cfgm = dataclasses.replace(PlasmaConfig(), **base, backend="fused", multistep=8)
ref = jax.jit(plasma.make_rollout(cfgp, 24))(plasma.init_state(cfgp))
s = jax.jit(plasma.make_rollout(cfgm, 24))(plasma.init_state(cfgm))
for name in ("f", "g", "Ex", "phi"):
    a = np.asarray(getattr(ref, name), np.float32)
    b = np.asarray(getattr(s, name), np.float32)
    sc = max(np.abs(a).max(), 1e-30)
    print(f"{name}: scale={sc:.3e} maxrel={np.abs(a-b).max()/sc:.3e} finite={np.isfinite(b).all()}")

steps, K = 2048, 64
cfgt = dataclasses.replace(PlasmaConfig(), **base, backend="fused", multistep=K)
short_n = K
roll = jax.jit(plasma.make_rollout(cfgt, steps))
short = jax.jit(plasma.make_rollout(cfgt, short_n))
per = jax.jit(plasma.make_rollout(cfgp, 256))
per_s = jax.jit(plasma.make_rollout(cfgp, 32))
def sync(r): return float(np.asarray(r.f[0,0,0,0], np.float32))
best = best_p = 0
for trial in range(3):
    st = plasma.init_state(cfgt); sync(roll(st)); st = plasma.init_state(cfgt); sync(short(st))
    st = plasma.init_state(cfgt)
    t0=time.perf_counter(); sync(short(st)); t1=time.perf_counter()
    st = plasma.init_state(cfgt)
    t2=time.perf_counter(); r=roll(st); sync(r); t3=time.perf_counter()
    assert np.isfinite(np.asarray(r.Ex, np.float32)).all()
    mlups = N*N*(steps-short_n)/((t3-t2)-(t1-t0))/1e6
    # per-step comparison
    st = plasma.init_state(cfgp); sync(per(st))
    st = plasma.init_state(cfgp)
    t0=time.perf_counter(); sync(per_s(st)); t1=time.perf_counter()
    st = plasma.init_state(cfgp)
    t2=time.perf_counter(); sync(per(st)); t3=time.perf_counter()
    mlups_p = N*N*(256-32)/((t3-t2)-(t1-t0))/1e6
    print(f"trial {trial}: multistep {mlups:.0f} MLUPS, per-step {mlups_p:.0f} MLUPS")
    best = max(best, mlups); best_p = max(best_p, mlups_p)
print(f"BEST {N}x{N} {sol} iters={iters}: multistep {best:.0f} vs per-step {best_p:.0f} MLUPS")
