"""lbm_tpu — TPU-native lattice-Boltzmann plasma engine (JAX/XLA/Pallas).

A brand-new implementation of the capabilities of the reference C++/OpenMP
three-population plasma LBM (AMSC-24-25/12-lb-12-lb, surveyed in SURVEY.md):
D2Q9 electrons/ions/neutrals with DDF thermal coupling, pairwise BGK + Guo
forcing, periodic / bounce-back boundaries, self-consistent electrostatic
Poisson solves (spectral + iterative), and the Ghia-validated single
population lid-driven cavity — redesigned TPU-first.
"""

from . import config, constants, units  # noqa: F401
from .config import (  # noqa: F401
    BC,
    CavityConfig,
    CompatFlags,
    PlasmaConfig,
    PoissonSolver,
    preset_cavity_ghia,
    preset_golden_plasma,
    preset_plasma_1024,
    preset_plasma_4096,
)

__version__ = "0.1.0"
