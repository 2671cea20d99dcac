"""Unit-system checks against hand-computed values (SURVEY.md appendix B)."""
import math

from lbm_tpu.config import PlasmaConfig
from lbm_tpu import units as U


def test_scales_golden_config():
    u = PlasmaConfig().units()
    # Debye length for n=1e11, T=1e4: lambda_D = sqrt(eps0 kB T/(n e^2))
    lam_d = math.sqrt(U.EPSILON0_SI * U.KB_SI * 1e4 / (1e11 * U.E_CHARGE_SI**2))
    assert abs(u.L0 - lam_d * 1e-2) / u.L0 < 1e-12
    # plasma frequency omega_p = sqrt(n e^2/(eps0 m_e));
    # t0 = 1/(sqrt(3) omega_p) * 1e-2 (the reference's code comment says
    # "rad(3)/w_p/100" but its formula computes 1/(sqrt(3) w_p)/100)
    w_p = math.sqrt(1e11 * U.E_CHARGE_SI**2 / (U.EPSILON0_SI * U.M_E_SI))
    assert abs(u.t0 - 1e-2 / (math.sqrt(3.0) * w_p)) / u.t0 < 1e-12


def test_lattice_constants():
    u = PlasmaConfig().units()
    assert abs(u.cs2 - 1.0 / 3.0) < 1e-14       # analytically exactly 1/3
    assert abs(u.kb - u.cs2) < 1e-14            # Kb_latt == cs2 numerically
    assert u.m_e == 1.0
    assert abs(u.m_i - U.U_SI / U.M_E_SI) < 1e-9
    assert u.q_e == -1.0
    assert u.q_i == 1.0
    assert u.rho_e_init == 1.0
    assert abs(u.rho_i_init - u.m_i) < 1e-12    # Z=1
    assert abs(u.rho_n_init - u.m_n * 1e7) / u.rho_n_init < 1e-14
    assert abs(u.T_e_init - 1.0) < 1e-15
    assert abs(u.T_i_init - 0.03) < 1e-15


def test_initial_charge_neutrality():
    u = PlasmaConfig().units()
    # q_i rho_i/m_i + q_e rho_e/m_e == 0 at init (the /Z in rho_i_init)
    rq = u.q_i * u.rho_i_init / u.m_i + u.q_e * u.rho_e_init / u.m_e
    assert abs(rq) < 1e-14


def test_external_field_conversion():
    u = PlasmaConfig().units()
    # E0 = M0 L0/(Q0 t0^2); Ex_ext = 1e-2 / E0
    E0 = u.M0 * u.L0 / (u.Q0 * u.t0**2)
    assert abs(u.Ex_ext - 1e-2 / E0) / abs(u.Ex_ext) < 1e-14
    assert u.Ey_ext == 0.0
