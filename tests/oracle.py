"""Independent numpy transliteration of the reference plasma physics.

This is the test oracle: a direct, loop/per-direction implementation of the
formulas documented in SURVEY.md sections 2-3 (UpdateMacro, 18 equilibria,
triple-BGK + Guo forcing + DDF thermal source, push streaming, Poisson
solvers), written in float64 numpy with no JAX. The production engine in
lbm_tpu/ must match this stage by stage on small grids.
"""
from __future__ import annotations

import numpy as np

CX = np.array([0, 1, 0, -1, 0, 1, -1, -1, 1])
CY = np.array([0, 0, 1, 0, -1, 1, 1, -1, -1])
W = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)
OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6])
Q = 9


class Oracle:
    def __init__(self, cfg):
        self.cfg = cfg
        self.u = cfg.units()
        NX, NY = cfg.NX, cfg.NY
        u = self.u
        # populations [Q, NY, NX] per species
        self.f = {s: np.zeros((Q, NY, NX)) for s in "ein"}
        self.g = {s: np.zeros((Q, NY, NX)) for s in "ein"}
        for i in range(Q):
            for y in range(NY // 4 + 1, (3 * NY) // 4):
                for x in range(NX // 4 + 1, (3 * NX) // 4):
                    self.f["e"][i, y, x] = W[i] * u.rho_e_init
                    self.g["e"][i, y, x] = W[i] * u.T_e_init
                    self.f["i"][i, y, x] = W[i] * u.rho_i_init
                    self.g["i"][i, y, x] = W[i] * u.T_i_init
            self.f["n"][i] = W[i] * u.rho_n_init
            self.g["n"][i] = W[i] * u.T_n_init
        self.Ex = np.full((NY, NX), u.Ex_ext)
        self.Ey = np.full((NY, NX), u.Ey_ext)
        self.phi = np.zeros((NY, NX))
        self.none_zeroed = False

    # ---- moments -----------------------------------------------------
    def update_macro(self):
        u = self.u
        self.rho, self.ux, self.uy, self.T = {}, {}, {}, {}
        qom = {"e": u.q_e / u.m_e, "i": u.q_i / u.m_i, "n": 0.0}
        self.rho_raw = {}
        for s in "ein":
            rho = self.f[s].sum(axis=0)
            px = (self.f[s] * CX[:, None, None]).sum(axis=0)
            py = (self.f[s] * CY[:, None, None]).sum(axis=0)
            T = self.g[s].sum(axis=0)
            self.rho_raw[s] = rho.copy()
            dead = rho < 1e-10
            ux = np.where((px == rho) | (px == -rho), 0.0, px / np.where(dead, 1, rho))
            uy = np.where((py == rho) | (py == -rho), 0.0, py / np.where(dead, 1, rho))
            ux = ux + 0.5 * qom[s] * self.Ex
            uy = uy + 0.5 * qom[s] * self.Ey
            self.rho[s] = np.where(dead, 0.0, rho)
            self.ux[s] = np.where(dead, 0.0, ux)
            self.uy[s] = np.where(dead, 0.0, uy)
            self.T[s] = np.where(dead, 0.0, T)
        self.uxp, self.uyp = {}, {}
        for a, b in ("ei", "en", "in"):
            ra, rb = self.rho_raw[a], self.rho_raw[b]
            both = (ra < 1e-10) & (rb < 1e-10)
            den = np.where(both, 1.0, ra + rb)
            self.uxp[a + b] = np.where(both, 0.0, (ra * self.ux[a] + rb * self.ux[b]) / den)
            self.uyp[a + b] = np.where(both, 0.0, (ra * self.uy[a] + rb * self.uy[b]) / den)
        rq = u.q_i * self.rho["i"] / u.m_i + u.q_e * self.rho["e"] / u.m_e
        self.rho_q = np.where(rq < 1e-15, 0.0, rq)

    # ---- equilibria ----------------------------------------------------
    def eq(self, amp, ux, uy):
        cs2 = self.u.cs2
        out = np.empty((Q,) + amp.shape)
        u2 = ux * ux + uy * uy
        for i in range(Q):
            cu = CX[i] * ux + CY[i] * uy
            out[i] = W[i] * amp * (
                1.0 + cu / cs2 + cu * cu / (2 * cs2 * cs2) - u2 / (2 * cs2)
            )
        return out

    def compute_equilibria(self):
        self.feq, self.geq = {}, {}
        for s in "ein":
            self.feq[s] = self.eq(self.rho[s], self.ux[s], self.uy[s])
            self.geq[s] = self.eq(self.T[s], self.ux[s], self.uy[s])
        for a, b in ("ei", "en", "in"):
            up, vp = self.uxp[a + b], self.uyp[a + b]
            self.feq[a + b] = self.eq(self.rho[a], up, vp)   # e.g. f_eq_e_i
            self.feq[b + a] = self.eq(self.rho[b], up, vp)   # e.g. f_eq_i_e
            self.geq[a + b] = self.eq(self.T[a], up, vp)
            self.geq[b + a] = self.eq(self.T[b], up, vp)

    # ---- collisions ---------------------------------------------------
    def collide(self):
        cfg, u = self.cfg, self.u
        taus = {"e": cfg.tau_e, "i": cfg.tau_i, "n": cfg.tau_n,
                "ei": cfg.tau_ei, "ie": cfg.tau_ei,
                "en": cfg.tau_en, "ne": cfg.tau_en,
                "in": cfg.tau_in, "ni": cfg.tau_in}
        partners = {"e": "in", "i": "en", "n": "ei"}

        def term(s, key, tau):
            rho = self.rho[s]
            r = 1.0 - 1.0 / tau
            return (2 * rho * r * r - 2 * r * rho - Q * self.feq[key] / tau) / (
                2 * (2 * r + Q * self.feq[key] / tau))

        g_new, f_new = {}, {}
        for s in "ein":
            p1, p2 = partners[s]
            t_s, t1, t2 = taus[s], taus[s + p1], taus[s + p2]
            tm = term(s, s, t_s) + term(s, s + p1, t1) + term(s, s + p2, t2)
            dE = self.rho[s] * tm * (self.ux[s] ** 2 + self.uy[s] ** 2)
            dT = -dE / u.kb
            C_T = (-(self.g[s] - self.geq[s]) / t_s
                   - (self.g[s] - self.geq[s + p1]) / t1
                   - (self.g[s] - self.geq[s + p2]) / t2)
            g_new[s] = self.g[s] + C_T + dT

            C = (-(self.f[s] - self.feq[s]) / t_s
                 - (self.f[s] - self.feq[s + p1]) / t1
                 - (self.f[s] - self.feq[s + p2]) / t2)
            if s in "ei":
                q = u.q_e if s == "e" else u.q_i
                m = u.m_e if s == "e" else u.m_i
                F = np.empty_like(self.f[s])
                for i in range(Q):
                    cE = CX[i] * self.Ex + CY[i] * self.Ey
                    cu = CX[i] * self.ux[s] + CY[i] * self.uy[s]
                    uE = self.ux[s] * self.Ex + self.uy[s] * self.Ey
                    F[i] = (W[i] * q * self.rho[s] / m / u.cs2
                            * (1.0 - 1.0 / (2 * t_s))
                            * (cE + cu * cE / u.cs2 - uE))
                f_new[s] = self.f[s] + C + F
            else:
                f_new[s] = self.f[s] + C
        self.g = g_new
        self.f = f_new

    # ---- streaming ------------------------------------------------------
    @staticmethod
    def stream_one(old, periodic, stale=None):
        """Push-stream one population set, replicating the reference's
        serial (x, y, i) write order; unwritten (corner-hole) slots retain
        the stale destination-buffer contents."""
        NY, NX = old.shape[1:]
        new = np.zeros_like(old) if stale is None else stale.copy()
        for x in range(NX):
            for y in range(NY):
                for i in range(Q):
                    xs, ys = x + CX[i], y + CY[i]
                    if periodic:
                        new[i, ys % NY, xs % NX] = old[i, y, x]
                    else:
                        x_in = 0 <= xs < NX
                        y_in = 0 <= ys < NY
                        if x_in and y_in:
                            new[i, ys, xs] = old[i, y, x]
                        elif x_in:
                            new[OPP[i], y, xs] = old[i, y, x]
                        elif y_in:
                            new[OPP[i], ys, x] = old[i, y, x]
                        else:
                            new[OPP[i], y, x] = old[i, y, x]
        return new

    def stream(self, f_pre_collide=None):
        """Reference temp-buffer chain (src/streaming.cpp via src/plasma.cpp):
        f streams with the pre-collision f as the stale buffer, g streams
        with the post-collision pre-stream f as the stale buffer."""
        from lbm_tpu.config import BC
        periodic = self.cfg.bc == BC.PERIODIC
        f_post = {s: self.f[s].copy() for s in "ein"}
        stale_f = f_pre_collide if f_pre_collide is not None else f_post
        for s in "ein":
            self.f[s] = self.stream_one(self.f[s], periodic, stale_f[s])
        for s in "ein":
            self.g[s] = self.stream_one(self.g[s], periodic, f_post[s])

    # ---- poisson --------------------------------------------------------
    def solve_poisson(self):
        from lbm_tpu.config import BC, PoissonSolver
        cfg = self.cfg
        if cfg.poisson == PoissonSolver.NONE:
            self.Ex[:] = 0.0
            self.Ey[:] = 0.0
            return
        periodic = cfg.bc == BC.PERIODIC
        if cfg.poisson == PoissonSolver.FFT:
            if not periodic:
                return
            self._solve_fft()
            self._efield_periodic()
            return
        if cfg.poisson == PoissonSolver.GS:
            self._solve_gs(omega=None)
        elif cfg.poisson == PoissonSolver.SOR:
            self._solve_gs(omega=cfg.omega_sor)
        elif cfg.poisson == PoissonSolver.NPS:
            self._solve_9point()
        if periodic:
            self._efield_periodic()
        else:
            self._efield_neumann()

    def _solve_fft(self):
        NY, NX = self.phi.shape
        rho_hat = np.fft.fft2(self.rho_q)
        ky = np.fft.fftfreq(NY) * NY
        kx = np.fft.fftfreq(NX) * NX
        den = 4.0 * (np.sin(np.pi * ky / NY)[:, None] ** 2
                     + np.sin(np.pi * kx / NX)[None, :] ** 2)
        phi_hat = np.where(den > 1e-15, rho_hat / np.where(den == 0, 1, den), 0.0)
        self.phi = np.real(np.fft.ifft2(phi_hat))

    def _solve_gs(self, omega):
        cfg = self.cfg
        NY, NX = self.phi.shape
        phi = self.phi
        for _ in range(cfg.poisson_max_iter):
            err = 0.0
            for parity in (0, 1):
                for j in range(1, NY - 1):
                    for i in range(1, NX - 1):
                        if (i + j) % 2 != parity:
                            continue
                        nb = phi[j, i + 1] + phi[j, i - 1] + phi[j + 1, i] + phi[j - 1, i]
                        gs = 0.25 * (nb + self.rho_q[j, i])
                        new = gs if omega is None else (1 - omega) * phi[j, i] + omega * gs
                        err = max(err, abs(new - phi[j, i]))
                        phi[j, i] = new
            if err < cfg.poisson_tol:
                break
        self.phi = phi

    def _solve_9point(self):
        cfg = self.cfg
        NY, NX = self.phi.shape
        phi = self.phi
        for _ in range(cfg.poisson_max_iter):
            err = 0.0
            for sweep in range(4):
                for j in range(1, NY - 1):
                    for i in range(1, NX - 1):
                        if 2 * (i % 2) + (j % 2) != sweep:
                            continue
                        so = phi[j, i + 1] + phi[j, i - 1] + phi[j + 1, i] + phi[j - 1, i]
                        sd = (phi[j + 1, i + 1] + phi[j + 1, i - 1]
                              + phi[j - 1, i + 1] + phi[j - 1, i - 1])
                        new = (4 * so + sd + 6 * self.rho_q[j, i]) / 20.0
                        err = max(err, abs(new - phi[j, i]))
                        phi[j, i] = new
            if err < cfg.poisson_tol:
                break
        self.phi = phi

    def _efield_periodic(self):
        self.Ex = -0.5 * (np.roll(self.phi, -1, axis=1) - np.roll(self.phi, 1, axis=1))
        self.Ey = -0.5 * (np.roll(self.phi, -1, axis=0) - np.roll(self.phi, 1, axis=0))

    def _efield_neumann(self):
        NY, NX = self.phi.shape
        Ex, Ey = self.Ex, self.Ey
        for j in range(1, NY - 1):
            for i in range(1, NX - 1):
                Ex[j, i] = -0.5 * (self.phi[j, i + 1] - self.phi[j, i - 1])
                Ey[j, i] = -0.5 * (self.phi[j + 1, i] - self.phi[j - 1, i])
        Ex[0, :] = Ex[1, :]; Ey[0, :] = Ey[1, :]
        Ex[-1, :] = Ex[-2, :]; Ey[-1, :] = Ey[-2, :]
        Ex[:, 0] = Ex[:, 1]; Ey[:, 0] = Ey[:, 1]
        Ex[:, -1] = Ex[:, -2]; Ey[:, -1] = Ey[:, -2]

    # ---- full step -------------------------------------------------------
    def step(self):
        self.update_macro()
        self.compute_equilibria()
        f_pre = {s: self.f[s].copy() for s in "ein"}
        self.collide()
        self.stream(f_pre_collide=f_pre)
        self.solve_poisson()
