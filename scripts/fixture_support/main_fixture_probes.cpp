// Probe-series fixture main: runs the reference RELEASE build
// (src/plasma.cpp + friends) at a realistic grid size with the golden
// physical parameters (src/main_plasma.cpp:16-51), then dumps the 19
// probe time series (visualize.cpp's ts_* buffers, 9 sample points each)
// to ref_probes.csv at full double precision. Closes the gap between the
// 8x8 stage-dump fixtures and the 200x200 golden-run claim.
//
// Usage: ref_probes [solver 0-4] [N] [NSTEPS] [bc 0|1]
#include "plasma.hpp"
#include "visualize.hpp"

#include <csignal>
#include <cstdio>
#include <cstdlib>
#include <unistd.h>

static int g_nsteps = 20;

static void dump_csv() {
    using namespace visualize;
    struct Row { const char* name; std::vector<std::array<double, P>>* ts; };
    const Row rows[] = {
        {"ux_e", &ts_ux_e}, {"uy_e", &ts_uy_e}, {"ue_mag", &ts_ue_mag},
        {"ux_i", &ts_ux_i}, {"uy_i", &ts_uy_i}, {"ui_mag", &ts_ui_mag},
        {"ux_n", &ts_ux_n}, {"uy_n", &ts_uy_n}, {"un_mag", &ts_un_mag},
        {"T_e", &ts_T_e}, {"T_i", &ts_T_i}, {"T_n", &ts_T_n},
        {"rho_e", &ts_rho_e}, {"rho_i", &ts_rho_i}, {"rho_n", &ts_rho_n},
        {"rho_q", &ts_rho_q},
        {"Ex", &ts_Ex}, {"Ey", &ts_Ey}, {"E_mag", &ts_E_mag},
    };
    FILE* f = std::fopen("ref_probes.csv", "w");
    if (!f) return;
    std::fprintf(f, "field,step,p0,p1,p2,p3,p4,p5,p6,p7,p8\n");
    for (const Row& r : rows)
        for (int t = 0; t < g_nsteps && t < (int)r.ts->size(); ++t) {
            std::fprintf(f, "%s,%d", r.name, t);
            for (int p = 0; p < P; ++p)
                std::fprintf(f, ",%.17e", (*r.ts)[t][p]);
            std::fprintf(f, "\n");
        }
    std::fclose(f);
}

// The reference binary is known to crash in OpenCV teardown after the run;
// the ts_* buffers are complete by then, so dump them from the handler.
static void on_fatal(int) {
    dump_csv();
    _exit(0);
}

int main(int argc, char* argv[]) {
    poisson::PoissonType solver = poisson::PoissonType::FFT;
    if (argc > 1) solver = static_cast<poisson::PoissonType>(std::atoi(argv[1]));
    int N = 200;
    if (argc > 2) N = std::atoi(argv[2]);
    g_nsteps = 20;
    if (argc > 3) g_nsteps = std::atoi(argv[3]);
    streaming::BCType bc = streaming::BCType::Periodic;
    if (argc > 4 && std::atoi(argv[4]) == 1) bc = streaming::BCType::BounceBack;

    std::signal(SIGSEGV, on_fatal);
    std::signal(SIGABRT, on_fatal);

    // golden SI parameters (src/main_plasma.cpp:16-51)
    LBmethod lb(g_nsteps, N, N, /*n_cores=*/4, /*Z=*/1, /*A=*/1,
                /*Ex_SI=*/1e-2, /*Ey_SI=*/0.0,
                /*T_e=*/1e4, /*T_i=*/300.0, /*T_n=*/300.0,
                /*n_e=*/1e11, /*n_n=*/1e18,
                solver, bc, /*omega_sor=*/1.8);
    lb.Run_simulation();
    dump_csv();
    return 0;
}
