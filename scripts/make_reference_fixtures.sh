#!/usr/bin/env bash
# Regenerates tests/fixtures/ref_dump_solver{0..4}.txt.gz — stage-by-stage
# dumps from the REFERENCE C++ implementation (its debug build), used by
# tests/test_reference_parity.py for trajectory cross-validation.
#
# The reference's FFT path needs FFTW, which this image lacks; fftw3_sub.h
# below is an exact (naive O(N^2)) DFT drop-in with FFTW's r2c/c2r layout —
# fine at the fixture's 8x8 grid. Everything is built in a scratch dir; no
# reference sources are modified or copied into the repo.
set -euo pipefail
REF="/root/reference/old codes/Plasma debug"
OUT="$(cd "$(dirname "$0")/.." && pwd)/tests/fixtures"
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT

cp "$(dirname "$0")/fixture_support/fftw3.h" "$WORK/fftw3.h"
cp "$(dirname "$0")/fixture_support/main_fixture.cpp" "$WORK/"

g++ -O2 -std=c++20 -fopenmp -I"$WORK" -I"$REF" -I/usr/include/opencv4 -w \
    "$WORK/main_fixture.cpp" "$REF/plasma_debug.cpp" \
    -lopencv_core -lopencv_imgproc -lopencv_videoio -lopencv_imgcodecs \
    -lopencv_highgui -o "$WORK/ref_fixture"

mkdir -p "$OUT"
cd "$WORK"
for s in 0 1 2 3 4; do
    rm -f debug_dump.txt
    # the binary segfaults in OpenCV teardown after the run; dumps are complete
    ./ref_fixture "$s" > /dev/null 2>&1 || true
    [ "$(grep -c '^stage = ' debug_dump.txt)" = "25" ]
    gzip -c debug_dump.txt > "$OUT/ref_dump_solver$s.txt.gz"
    echo "solver $s ok"
done
# bounce-back variants (NONE and GS)
for s in 0 1; do
    rm -f debug_dump.txt
    ./ref_fixture "$s" 1 > /dev/null 2>&1 || true
    [ "$(grep -c '^stage = ' debug_dump.txt)" = "25" ]
    gzip -c debug_dump.txt > "$OUT/ref_dump_solver${s}_bb.txt.gz"
    echo "solver $s bounce-back ok"
done

# Golden-size probe-series fixture from the RELEASE build (src/): the 19
# probe time series at 200x200 for the FULL 200-step golden window with the
# FFT solver — the configuration of the committed golden artifacts
# (src/main_plasma.cpp, build/graphs_200x200_200TS/).
REL_SRC="/root/reference/src"
REL_INC="/root/reference/include"
cp "$(dirname "$0")/fixture_support/main_fixture_probes.cpp" "$WORK/"
g++ -O2 -std=c++20 -fopenmp -I"$WORK" -I"$REL_INC" -I/usr/include/opencv4 -w \
    "$WORK/main_fixture_probes.cpp" \
    "$REL_SRC/plasma.cpp" "$REL_SRC/collisions.cpp" "$REL_SRC/streaming.cpp" \
    "$REL_SRC/poisson.cpp" "$REL_SRC/visualize.cpp" \
    -lopencv_core -lopencv_imgproc -lopencv_videoio -lopencv_imgcodecs \
    -lopencv_highgui -o "$WORK/ref_probes"
rm -f ref_probes.csv
"$WORK/ref_probes" 3 200 200 > /dev/null 2>&1 || true
[ "$(wc -l < ref_probes.csv)" = "3801" ]  # header + 19 fields x 200 steps
gzip -c ref_probes.csv > "$OUT/ref_probes_200x200_200steps_fft.csv.gz"
echo "probe series 200x200/200 ok"
