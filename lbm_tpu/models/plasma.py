"""Three-population (e/i/n) D2Q9 plasma model: state, init, and the step.

The step pipeline order replicates the reference's time loop
(reference: src/plasma.cpp:476-523):

    1. update_macro      (moments + half-force + mixtures + rho_q)
    2. equilibria        (computed inline inside collide)
    3. collide           (thermal first, then mass — src/collisions.cpp:35-55)
    4. stream (+ BC)
    5. Poisson solve -> E

Visualization/probing is NOT inside the step (the reference renders
synchronously in the loop; here observation is pulled from the returned
state by the host, off the hot path).

State layout: populations f, g as (3, 9, NY, NX) arrays (species-major,
direction next, lattice minor so NX maps to TPU lanes).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BC, PlasmaConfig, PoissonSolver
from ..constants import D2Q9
from ..ops import poisson as poisson_ops
from ..ops.collide import collide
from ..ops.macros import Macros, update_macro
from ..ops import stream as stream_ops
from ..ops.stream import stream_bounceback, stream_periodic


class PlasmaState(NamedTuple):
    """Full simulation state (a pytree; everything needed to resume)."""

    f: jnp.ndarray    # (3, Q, NY, NX) mass populations (e, i, n)
    g: jnp.ndarray    # (3, Q, NY, NX) thermal (DDF) populations
    Ex: jnp.ndarray   # (NY, NX)
    Ey: jnp.ndarray   # (NY, NX)
    phi: jnp.ndarray  # (NY, NX) potential, warm-started across steps
    step: jnp.ndarray  # () int32


def init_state(cfg: PlasmaConfig) -> PlasmaState:
    """Initial condition (reference: src/plasma.cpp:131-158).

    Electrons and ions (mass and thermal populations) are seeded at w_i *
    rho_init only inside the center box x in (NX/4, 3NX/4), y in (NY/4,
    3NY/4) (exclusive); neutrals fill the whole domain. E starts at the
    external field; phi at zero.
    """
    u = cfg.units()
    NX, NY = cfg.NX, cfg.NY
    dtype = cfg.dtype

    @jax.jit
    def build():
        # built on-device: at 2048^2 the f+g state is ~0.9 GB — host-side
        # construction + transfer dominates everything else
        iy = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 1)
        box = ((iy >= NY // 4 + 1) & (iy < (3 * NY) // 4)
               & (ix >= NX // 4 + 1) & (ix < (3 * NX) // 4)).astype(dtype)
        ones = jnp.ones((NY, NX), dtype)
        # per-(species, direction) amplitudes in float64 on host, cast once
        w = np.asarray(D2Q9.W)  # float64
        # delta mode: f[2] holds deviations from rho_n_init * w_i, which is
        # exactly the (uniform) neutral initial condition -> deltas are 0
        rho_n_amp = 0.0 if cfg.neutral_delta else u.rho_n_init
        amp_f = np.stack([w * u.rho_e_init, w * u.rho_i_init,
                          w * rho_n_amp]).astype(dtype)
        amp_g = np.stack([w * u.T_e_init, w * u.T_i_init,
                          w * u.T_n_init]).astype(dtype)
        mask = jnp.stack([box, box, ones])            # (3, NY, NX)
        f = jnp.asarray(amp_f)[:, :, None, None] * mask[:, None]
        g = jnp.asarray(amp_g)[:, :, None, None] * mask[:, None]
        if cfg.storage == "bf16":
            f = f.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16)
        return PlasmaState(
            f=f, g=g,
            Ex=jnp.full((NY, NX), u.Ex_ext, dtype),
            Ey=jnp.full((NY, NX), u.Ey_ext, dtype),
            phi=jnp.zeros((NY, NX), dtype),
            step=jnp.zeros((), jnp.int32),
        )

    return build()


def _use_pallas_fft(cfg: PlasmaConfig, shape) -> bool:
    """Resolve cfg.fft_engine for this grid/platform (see config.py)."""
    if cfg.fft_engine == "xla":
        return False
    from ..kernels import fft_tpu
    if cfg.fft_engine == "pallas":
        if not fft_tpu.supports(*shape):
            raise ValueError(
                f"fft_engine='pallas' needs both grid axes = power-of-two "
                f"* 128, got {shape}")
        if jnp.dtype(cfg.dtype) != jnp.float32:
            # the kernels compute in f32; silently downgrading an f64
            # parity run's E field would be a trap
            raise ValueError("fft_engine='pallas' is f32-only "
                             "(the xla engine serves f64 parity runs)")
        return True
    # "auto" resolves to xla for now: the pallas four-step measured SLOWER
    # than the packed-XLA solve at 2048^2 (2.69 vs 1.63 ms — the Stockham
    # sublane restructuring and the transposed y-DFT relayouts dominate);
    # revisit if the kernel path beats it (docs/STATUS.md round-3 ledger).
    return False


def _use_pallas_iter(cfg: PlasmaConfig, shape) -> bool:
    """Resolve cfg.iter_engine for this grid (see config.py): the
    VMEM-resident while_loop kernel vs the jnp roll sweeps. The jnp
    backend always keeps xla (CPU parity runs); sharded constructors
    force xla (a shard-local sweep would be wrong)."""
    if cfg.iter_engine == "xla":
        return False
    from ..kernels import poisson_iter
    fits = poisson_iter.check_vmem_iter(
        shape[0], shape[1], jnp.dtype(cfg.dtype).itemsize)
    if cfg.iter_engine == "pallas":
        if not fits:
            raise ValueError(
                f"iter_engine='pallas': {shape[0]}x{shape[1]} exceeds the "
                f"solve kernel's whole-grid VMEM budget (use 'auto'/'xla')")
        if (jnp.dtype(cfg.dtype) != jnp.float32
                and not cfg.kernel_interpret):
            # the compiled kernel computes in f32 (Mosaic can't lower x64
            # traces); fail clearly here rather than deep in lowering —
            # same guard as _use_pallas_fft (interpret mode runs f64 and
            # serves the bitwise CPU tests)
            raise ValueError("iter_engine='pallas' is f32-only on hardware "
                             "(the xla engine serves f64 parity runs)")
        return True
    # "auto": the kernel, where it applies — measured on v5e-1 (2026-08-20,
    # scripts/measure_poisson_iter.py; docs/STATUS.md round-4 ledger):
    # solve-only GS 100 sweeps 1.4/1.6/1.7x at 256^2/512^2/1024^2 with
    # BITWISE-identical phi, full fused-step GS/SOR 2.0-2.2x end-to-end.
    # Gates: kernel backends only (the jnp backend serves CPU/f64 parity
    # runs), f32 (Mosaic can't lower x64 traces), VMEM-feasible grid, and
    # a real accelerator (interpret-on-CPU would be slower than XLA).
    # The cfg.kernel_interpret escape exists for the CPU bitwise tests:
    # an interpret-mode fused run on CPU deliberately routes the solve
    # through the interpret while_loop kernel (slow at large max_iter —
    # force iter_engine='xla' if that bites a CPU run).
    return (fits
            and cfg.backend in ("fused", "pallas")
            and jnp.dtype(cfg.dtype) == jnp.float32
            and (jax.default_backend() != "cpu" or cfg.kernel_interpret))


def reconstruct_phi(cfg: PlasmaConfig, state: "PlasmaState") -> jnp.ndarray:
    """The electrostatic potential of the CURRENT state's charge density.

    The pallas FFT path never materializes phi (state.phi goes stale);
    this recomputes one. Note the alignment: the state's Ex/Ey derive
    from the PRE-step rho_q (UpdateMacro of the step that produced the
    state), which is gone — this phi is the solve of the POST-step
    rho_q, i.e. ONE STEP AHEAD of the stored E. That is exactly the phi
    a resumed run's first solve would produce, so it is the correct warm
    start; it is NOT -grad^-1 of the stored E (the xla path's stored phi
    is)."""
    mac = compute_macros(cfg, state)
    return poisson_ops.solve_fft(mac.rho_q)


def _solve_poisson(
    cfg: PlasmaConfig,
    rho_q: jnp.ndarray,
    phi: jnp.ndarray,
    Ex: jnp.ndarray,
    Ey: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Poisson dispatch replicating src/poisson.cpp:25-82. Returns (Ex, Ey, phi)."""
    sol = cfg.poisson
    compat = cfg.compat

    if sol == PoissonSolver.NONE:
        if compat.none_solver_kills_external_field:
            # The reference zeroes E on the first call and never restores it
            # (src/poisson.cpp:34-43). Since the solve runs every step, the
            # post-step field is always zero.
            z = jnp.zeros_like(Ex)
            return z, z, phi
        return Ex, Ey, phi

    periodic_bc = cfg.bc == BC.PERIODIC

    if sol == PoissonSolver.FFT:
        if not periodic_bc:
            # FFT under bounce-back: the reference returns without solving
            # (src/poisson.cpp:76-77) — E keeps its previous value.
            return Ex, Ey, phi
        if _use_pallas_fft(cfg, rho_q.shape):
            from ..kernels import fft_tpu
            Ex2, Ey2 = fft_tpu.solve_fft_efield_tpu(
                rho_q, interpret=cfg.kernel_interpret)
            # phi is not materialized on this path (no warm start needed);
            # reconstruct_phi() serves checkpoints/diagnostics lazily
            return Ex2, Ey2, phi
        phi = poisson_ops.solve_fft(rho_q)
        Ex2, Ey2 = poisson_ops.efield_periodic(phi)
        return Ex2, Ey2, phi

    # Iterative solvers. In compat mode the Dirichlet (interior-only) sweeps
    # run even under periodic BCs, matching the reference's dispatcher; the
    # E-field reconstruction still follows the BC type.
    iter_periodic = periodic_bc and not compat.dirichlet_iterative_under_periodic
    if _use_pallas_iter(cfg, rho_q.shape):
        # whole warm-started while_loop VMEM-resident in one launch;
        # same sweep/stopping function the multistep windows run
        # (fused_multistep.solve_iter_val) — see kernels/poisson_iter.py
        from ..kernels import poisson_iter
        kind = "nps" if sol == PoissonSolver.NPS else "gs"
        omega = cfg.omega_sor if sol == PoissonSolver.SOR else None
        spec = (kind, omega, cfg.poisson_max_iter, cfg.poisson_tol,
                not iter_periodic)
        phi = poisson_iter.solve_iter_tpu(phi, rho_q, spec=spec,
                                          interpret=cfg.kernel_interpret)
    else:
        kw = dict(periodic=iter_periodic, max_iter=cfg.poisson_max_iter,
                  tol=cfg.poisson_tol)
        if sol == PoissonSolver.GS:
            phi = poisson_ops.solve_gs(phi, rho_q, **kw)
        elif sol == PoissonSolver.SOR:
            phi = poisson_ops.solve_gs(phi, rho_q, omega=cfg.omega_sor, **kw)
        elif sol == PoissonSolver.NPS:
            phi = poisson_ops.solve_9point(phi, rho_q, **kw)
        else:  # pragma: no cover
            raise ValueError(f"unknown solver {sol}")

    if periodic_bc:
        Ex2, Ey2 = poisson_ops.efield_periodic(phi)
    else:
        Ex2, Ey2 = poisson_ops.efield_neumann(phi)
    return Ex2, Ey2, phi


def compute_macros(cfg: PlasmaConfig, state: PlasmaState) -> Macros:
    """Macroscopic fields for observation/diagnostics (same op as the step)."""
    u = cfg.units()
    gv = ((0.01 * u.cs2, 0.00001 * u.cs2, 0.0)
          if cfg.compat.debug_variant else (0.0, 0.0, 0.0))
    f, g = state.f, state.g
    if cfg.storage == "bf16":
        f = f.astype(cfg.dtype)
        g = g.astype(cfg.dtype)
    return update_macro(f, g, state.Ex, state.Ey,
                        q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                        guard_vals=gv,
                        neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0)


def _neutral_hole_backgrounds(ref: float):
    """Per-HOLE_SLOT background f value rho_ref * w_i for the neutral.

    The reference's g-streaming leaks POST-COLLISION F values into the 8
    bounce-back corner holes (recycled temp buffer, see
    stream._bounceback_gather_map). In delta mode f[2] holds deltas, so the
    classic leaked value is delta + rho_ref * w_i — g is not delta-stored,
    so the background must be added back to keep the quirk bit-compatible.
    """
    return [ref * float(D2Q9.W[i]) for (i, _, _) in stream_ops.HOLE_SLOTS]


def _g_holes_with_background(vals, neutral_ref: float, compute_dtype=None):
    """Add the neutral background to the 8 g-hole values. `compute_dtype`
    (bf16-storage mode) does the add at full precision. Note the fused
    path's hole bases are already bf16-rounded (the kernel stored them),
    so those 8 cells round twice vs the jnp path's round-at-final-write —
    at most one bf16 ulp of the ~1.8e10 background, inside the g-channel
    tolerance (the unrounded values are not recoverable from the in-place
    kernel output)."""
    if neutral_ref == 0.0:
        return vals
    bgs = _neutral_hole_backgrounds(neutral_ref)
    if compute_dtype is None:
        return [v.at[..., 2].add(bg) for v, bg in zip(vals, bgs)]
    return [v.astype(compute_dtype).at[..., 2].add(bg).astype(v.dtype)
            for v, bg in zip(vals, bgs)]


def make_step(cfg: PlasmaConfig) -> Callable[[PlasmaState], PlasmaState]:
    """Build the jittable single-step function for this configuration."""
    u = cfg.units()
    periodic = cfg.bc == BC.PERIODIC
    use_pallas = cfg.backend == "pallas"
    use_fused = cfg.backend == "fused"
    use_split = False
    storage_bf16 = cfg.storage == "bf16"
    if storage_bf16 and cfg.backend == "pallas":
        raise ValueError("bf16 storage supports the jnp and fused backends")
    if use_fused:
        from ..kernels.fused_split import _pick_band_split
        from ..kernels.fused_step import _pick_band
        itemsize = 2 if storage_bf16 else jnp.dtype(cfg.dtype).itemsize
        try:
            _pick_band(cfg.NY, cfg.NX, itemsize)
        except ValueError:
            # grid too wide for the single kernel's full-width bands: try
            # the mass/thermal split pair (fits at 2x the width), then the
            # fused-collide kernel + XLA roll streaming
            use_fused = False
            if not storage_bf16:  # split/pallas kernels are native-dtype
                try:
                    _pick_band_split(cfg.NY, cfg.NX, itemsize)
                    use_split = True
                except ValueError:
                    use_pallas = True
    debug_variant = cfg.compat.debug_variant
    if debug_variant and (use_fused or use_pallas or use_split):
        raise ValueError("debug_variant mode is jnp-backend only")
    guard_vals = ((0.01 * u.cs2, 0.00001 * u.cs2, 0.0) if debug_variant
                  else (0.0, 0.0, 0.0))
    neutral_ref = u.rho_n_init if cfg.neutral_delta else 0.0
    phys = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb, interpret=cfg.kernel_interpret,
                neutral_ref=neutral_ref)

    def collide_stage(state: PlasmaState):
        if use_pallas:
            from ..kernels.collide_pallas import fused_collide
            return fused_collide(
                state.f, state.g, state.Ex, state.Ey,
                taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                cs2=u.cs2, kb=u.kb, interpret=cfg.kernel_interpret,
                neutral_ref=neutral_ref)
        mac = update_macro(state.f, state.g, state.Ex, state.Ey,
                           q_e=u.q_e, q_i=u.q_i, m_e=u.m_e, m_i=u.m_i,
                           guard_vals=guard_vals, neutral_ref=neutral_ref)
        f_post, g_post = collide(state.f, state.g, mac, state.Ex, state.Ey,
                                 taus=cfg.taus, q_e=u.q_e, q_i=u.q_i,
                                 m_e=u.m_e, m_i=u.m_i, cs2=u.cs2, kb=u.kb,
                                 neutral_ref=neutral_ref,
                                 # bf16 mode: same partial-fraction thermal
                                 # algebra as the kernel, exact reciprocal
                                 # (the kernel's approx one is Pallas-only)
                                 g_recip=(lambda x: 1.0 / x)
                                 if storage_bf16 else None)
        return f_post, g_post, mac.rho_q

    def step(state: PlasmaState) -> PlasmaState:
        if use_fused or use_split:
            if not periodic:
                # Bounce-back rides the periodic kernel: reflections are
                # edge-only corrections on the periodic result, and every
                # post-collision value the fixups need is recoverable from
                # it at a shifted index (ops/stream.py). The holes' stale
                # contents are 8 pre-collision scalars, read before the
                # in-place kernel consumes state.f.
                f_holes = stream_ops.hole_values(state.f)
            if use_split:
                from ..kernels.fused_split import collide_stream_split
                f, g, rho_q = collide_stream_split(
                    state.f, state.g, state.Ex, state.Ey, **phys)
            else:
                from ..kernels.fused_step import collide_stream
                f, g, rho_q = collide_stream(state.f, state.g, state.Ex,
                                             state.Ey, **phys)
            if not periodic:
                g_holes = _g_holes_with_background(
                    stream_ops.hole_values_from_periodic(f), neutral_ref,
                    compute_dtype=cfg.dtype if storage_bf16 else None)
                f = stream_ops.bounceback_from_periodic(f, f_holes)
                g = stream_ops.bounceback_from_periodic(g, g_holes)
            Ex, Ey, phi = _solve_poisson(cfg, rho_q, state.phi,
                                         state.Ex, state.Ey)
            return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=phi,
                               step=state.step + 1)
        if storage_bf16:
            # storage rounding happens exactly once per step, at the final
            # HBM write; everything in between runs in cfg.dtype
            state = state._replace(f=state.f.astype(cfg.dtype),
                                   g=state.g.astype(cfg.dtype))
        f_post, g_post, rho_q = collide_stage(state)
        if periodic:
            f = stream_periodic(f_post)
            g = stream_periodic(g_post)
        else:
            # The reference's recycled temp buffers leak stale values into
            # the corner hole slots: pre-collision f for the f-streaming,
            # post-collision f for the g-streaming (see stream_bounceback).
            # The debug predecessor has its own g-temp buffers, so its g
            # holes retain pre-collision g instead.
            f = stream_bounceback(f_post, stale=state.f)
            if debug_variant:
                g = stream_bounceback(g_post, stale=state.g)
            else:
                g_holes = _g_holes_with_background(
                    stream_ops.hole_values(f_post), neutral_ref)
                g = stream_ops.bounceback_from_periodic(
                    stream_periodic(g_post), g_holes)
        Ex, Ey, phi = _solve_poisson(cfg, rho_q, state.phi, state.Ex, state.Ey)
        if debug_variant:
            # "pulsed" external field: zeroed at the end of step 0 for every
            # solver (plasma_debug.cpp:1558-1566)
            first = state.step == 0
            Ex = jnp.where(first, 0.0, Ex)
            Ey = jnp.where(first, 0.0, Ey)
        if storage_bf16:
            f = f.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16)
        return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=phi, step=state.step + 1)

    return step


def make_rollout(cfg: PlasmaConfig, n: Optional[int] = None):
    """scan-based multi-step rollout: state -> state after n steps.

    cfg.multistep > 0 (config-validated) runs temporally-blocked windows
    instead: K whole steps per kernel launch with the (f, g) state
    VMEM-resident (kernels/fused_multistep.py). Under the NONE quirk the
    per-step E zeroing happens once per window — the kernel collides
    step 1 with the state's field and later steps with 0, exactly the
    per-step dispatch order; FFT + bounce-back is the reference's no-op
    solve (src/poisson.cpp:76-77), so every step collides with the
    state's E; FFT + periodic (the golden configuration) runs the
    spectral solve IN-KERNEL each step (MXU DFT matmuls) and the window
    returns the final step's (Ex, Ey, phi) like the per-step path."""
    n_steps = cfg.nsteps if n is None else n

    if getattr(cfg, "multistep", 0):
        from ..kernels.fused_multistep import (
            check_vmem_multistep_plasma, collide_stream_multistep,
            collide_stream_multistep_banded, pick_multistep_bands_plasma)

        u = cfg.units()
        kill = (cfg.poisson == PoissonSolver.NONE
                and cfg.compat.none_solver_kills_external_field)
        periodic_bc = cfg.bc == BC.PERIODIC
        solve = cfg.poisson == PoissonSolver.FFT and periodic_bc
        ispec = None
        it_kinds = {PoissonSolver.GS: ("gs", None),
                    PoissonSolver.SOR: ("gs", cfg.omega_sor),
                    PoissonSolver.NPS: ("nps", None)}
        if cfg.poisson in it_kinds:
            # replicate _solve_poisson's dispatch: the compat quirk runs
            # the Dirichlet (interior-only) sweeps even under periodic
            # BCs; E reconstruction follows the BC type
            kind, omega = it_kinds[cfg.poisson]
            interior_only = (not periodic_bc
                             or cfg.compat.dirichlet_iterative_under_periodic)
            ispec = (kind, omega, cfg.poisson_max_iter, cfg.poisson_tol,
                     interior_only, not periodic_bc)
        K = min(int(cfg.multistep), max(n_steps, 1))
        full, rem = divmod(n_steps, K)
        bounce = cfg.bc == BC.BOUNCE_BACK
        kw = dict(taus=cfg.taus, q_e=u.q_e, q_i=u.q_i, m_e=u.m_e,
                  m_i=u.m_i, cs2=u.cs2, kb=u.kb,
                  neutral_ref=u.rho_n_init if cfg.neutral_delta else 0.0,
                  kill_field=kill, bounce=bounce,
                  solve_fft=solve, solve_iter=ispec,
                  interpret=cfg.kernel_interpret)

        # Past the whole-state VMEM budget, every constant-E config —
        # NONE under either BC, FFT + bounce-back (the no-op solve) —
        # runs the K-deep-ghost BANDED windows (periodic: the ghost slabs
        # are the true neighbors; bounce-back: the GATED kernel's traced
        # walls block the boundary bands' garbage ghosts)
        itemsize = (2 if cfg.storage == "bf16"
                    else jnp.dtype(cfg.dtype).itemsize)
        bands = None
        if not check_vmem_multistep_plasma(
                cfg.NY, cfg.NX, itemsize,
                solve=bool(solve) or ispec is not None):
            if solve or ispec:
                raise ValueError(
                    f"multistep at {cfg.NY}x{cfg.NX} exceeds the kernel's "
                    f"whole-state VMEM budget, and banded temporal "
                    f"blocking needs a window-constant E (the in-kernel "
                    f"solvers are global)")
            bands = pick_multistep_bands_plasma(cfg.NY, cfg.NX, itemsize, K)
            if bands is None:
                raise ValueError(
                    f"multistep K={K} at {cfg.NY}x{cfg.NX}: no band split "
                    f"fits the kernel's VMEM budget (smaller K)")

        def window(state: PlasmaState, k: int) -> PlasmaState:
            if solve or ispec:
                f, g, Ex, Ey, phi = collide_stream_multistep(
                    state.f, state.g, state.Ex, state.Ey, state.phi,
                    k_steps=k, **kw)
                return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey,
                                   phi=phi.astype(state.phi.dtype),
                                   step=state.step + k)
            if bands is not None:
                kwb = {k2: v for k2, v in kw.items()
                       if k2 not in ("solve_fft", "solve_iter")}
                f, g = collide_stream_multistep_banded(
                    state.f, state.g, state.Ex, state.Ey, k_steps=k,
                    bands=bands, **kwb)
            else:
                f, g = collide_stream_multistep(
                    state.f, state.g, state.Ex, state.Ey, k_steps=k, **kw)
            Ex, Ey = ((jnp.zeros_like(state.Ex), jnp.zeros_like(state.Ey))
                      if kill else (state.Ex, state.Ey))
            return PlasmaState(f=f, g=g, Ex=Ex, Ey=Ey, phi=state.phi,
                               step=state.step + k)

        def rollout_ms(state: PlasmaState) -> PlasmaState:
            if full:
                def body(s, _):
                    return window(s, K), None
                state, _ = jax.lax.scan(body, state, None, length=full)
            if rem:
                state = window(state, rem)
            return state

        return rollout_ms

    step = make_step(cfg)

    def rollout(state: PlasmaState) -> PlasmaState:
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return rollout
