// Test-fixture main: runs the reference debug build on a tiny grid so its
// stage-by-stage dumps (debug_dump.txt) can be compared against the JAX
// engine. Parameters mirror src/main_plasma.cpp's golden configuration but
// at NX=NY=8 with the GS solver (FFTW-free).
#include "plasma_debug.hpp"
#include <cstdlib>
int main(int argc, char* argv[]) {
    const size_t NX = 8, NY = 8, NSTEPS = 5;
    const size_t n_cores = 1;
    PoissonType solver = PoissonType::GAUSS_SEIDEL;
    if (argc > 1) solver = static_cast<PoissonType>(std::atoi(argv[1]));
    BCType bc = BCType::PERIODIC;
    if (argc > 2 && std::atoi(argv[2]) == 1) bc = BCType::BOUNCE_BACK;
    LBmethod lb(NSTEPS, NX, NY, n_cores, 1, 1,
                1e-2, 0.0,            // Ex_SI, Ey_SI (golden values)
                1e4, 300.0, 300.0,    // T_e, T_i, T_n
                1e11, 1e18,           // n_e, n_n
                solver, bc, 1.8);
    lb.Run_simulation();
    return 0;
}
