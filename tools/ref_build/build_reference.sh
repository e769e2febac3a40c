#!/bin/sh
# Rebuild the reference SvtAv1EncApp (v0.4.0) without yasm/nasm:
# the 9 .asm files are replaced by C stubs with identical semantics
# (tools/ref_build/asm_stubs.c — delegating to the _c twins from
# aom_dsp_rtcd.h); every intrinsic C file compiles unmodified, so the
# SIMD load is real. Produces /tmp/svtref/Bin/Release/SvtAv1EncApp,
# the BD-rate / throughput anchor used by tools/rd_experiment.py.
set -e
SRC=${1:-/root/reference}
DST=${2:-/tmp/svtref}
rm -rf "$DST"
cp -r "$SRC" "$DST"
chmod -R u+w "$DST"
cd "$DST"
sed -i 's/project(${project_name} C ASM_NASM)/project(${project_name} C)/' CMakeLists.txt
sed -i 's/"\*\.asm"//' Source/Lib/ASM_SSE2/CMakeLists.txt
cp "$(dirname "$0")/asm_stubs.c" Source/Lib/ASM_SSE2/asm_stubs.c
mkdir -p build && cd build
cmake .. -DCMAKE_BUILD_TYPE=Release
make -j"$(nproc)"
