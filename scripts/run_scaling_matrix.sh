#!/usr/bin/env bash
# Scalability-artifact matrix: the reference's missing (BC, solver) sweep
# families (build/Scalability_analysis.py runs Periodic x {NONE,FFT,GS,SOR}
# and BounceBack x {NONE,SOR}) as strong/weak/grid-impact device sweeps on
# the virtual CPU mesh. Each family gets its own CSV + .meta.json sidecar
# (virtual-mesh caveat stamped on every plot by scaling.py plot).
set -euo pipefail
cd "$(dirname "$0")/.."
A=artifacts/scaling
S="python scripts/scaling.py run --devices 1,2,4,8 --steps 10 --repeats 3"

# BounceBack x NONE: strong + grid impact + surface, then weak
$S --grids 128,256,512 --solvers NONE --bc BOUNCE_BACK --csv $A/scaling_devices_bb_none.csv
$S --grids 128 --weak  --solvers NONE --bc BOUNCE_BACK --csv $A/scaling_devices_bb_none.csv
python scripts/scaling.py plot --csv $A/scaling_devices_bb_none.csv

# BounceBack x SOR (the reference's second bounce-back family)
$S --grids 128,256 --solvers SOR --bc BOUNCE_BACK --poisson-iters 100 --steps 5 --csv $A/scaling_devices_bb_sor.csv
$S --grids 128 --weak --solvers SOR --bc BOUNCE_BACK --poisson-iters 100 --steps 5 --csv $A/scaling_devices_bb_sor.csv
python scripts/scaling.py plot --csv $A/scaling_devices_bb_sor.csv

# Periodic x {GS, SOR}: the iterative-solver strong/weak families (the
# reference's GS oversubscription-cliff rows live here)
$S --grids 128,256 --solvers GS,SOR --bc PERIODIC --poisson-iters 100 --steps 5 --csv $A/scaling_devices_iter.csv
$S --grids 128 --weak --solvers GS,SOR --bc PERIODIC --poisson-iters 100 --steps 5 --csv $A/scaling_devices_iter.csv
python scripts/scaling.py plot --csv $A/scaling_devices_iter.csv

# Periodic x NONE (cheap; completes the reference's 6-family matrix)
$S --grids 128,256,512 --solvers NONE --bc PERIODIC --csv $A/scaling_devices_none.csv
$S --grids 128 --weak  --solvers NONE --bc PERIODIC --csv $A/scaling_devices_none.csv
python scripts/scaling.py plot --csv $A/scaling_devices_none.csv

echo DONE
