#!/usr/bin/env bash
# Build the C++ PL-SLAM reference (/root/reference) HEADLESS for the
# BASELINE.md accuracy/performance comparison (VERDICT r2 "next round" #1).
#
# The environment has cmake, g++ 12, OpenCV 4.6 with the line_descriptor
# contrib module — but no Pangolin, no Ceres, no system Eigen.  This script
#   1. copies the read-only reference into $BUILD_DIR/ref,
#   2. applies scripts/reference_headless.patch:
#      - top-level CMakeLists: OpenCV 4, no Pangolin/Ceres/OpenMP, Release,
#        Eigen headers from the TensorFlow wheel, Viewer/MapDrawer compiled
#        out (replaced by no-op header stubs so System/Tracking still link),
#      - OpenCV 4 API fixes (CV_AA -> cv::LINE_AA, <opencv/cv.h> ->
#        <opencv2/opencv.hpp> + types_c.h),
#      - [dbg] init diagnostics in Tracking/Initializer (stdout only),
#      - tools/train_vocab.cc: trains a DBoW2 text vocabulary from a
#        directory of images with the reference's own ORBextractor (the
#        repo ships no vocabulary and upstream ORBvoc.txt is unavailable
#        offline),
#   3. builds Thirdparty/DBoW2, Thirdparty/g2o, libORB_SLAM2, the
#      Monocular/RGB-D/Stereo examples, and tools/train_vocab.
#
# Usage: scripts/build_reference.sh [BUILD_DIR]   (default /tmp/refbuild)
set -euo pipefail

BUILD_DIR=${1:-/tmp/refbuild}
REPO=$(cd "$(dirname "$0")/.." && pwd)
REF_SRC=/root/reference
EIGEN_TF=/opt/venv/lib/python3.12/site-packages/tensorflow/include
JOBS=${JOBS:-$(nproc)}

if [ -x "$BUILD_DIR/ref/Examples/Monocular/mono_tum" ] \
   && [ -x "$BUILD_DIR/ref/tools/train_vocab" ] \
   && [ -z "${FORCE:-}" ]; then
  echo "already built: $BUILD_DIR/ref (set FORCE=1 to rebuild)"
  exit 0
fi

mkdir -p "$BUILD_DIR/eigen_compat"
ln -sfn "$EIGEN_TF" "$BUILD_DIR/eigen_compat/eigen3"

echo "== copying reference -> $BUILD_DIR/ref"
rm -rf "$BUILD_DIR/ref"
cp -r "$REF_SRC" "$BUILD_DIR/ref"
chmod -R u+w "$BUILD_DIR/ref"

echo "== applying headless patch"
# the patch was generated against prefix /root/reference (a) -> ref (b)
(cd "$BUILD_DIR" && patch -p1 -d ref --no-backup-if-mismatch \
   < "$REPO/scripts/reference_headless.patch" ) || {
  echo "patch failed"; exit 1; }

REF="$BUILD_DIR/ref"
CMFLAGS=(-DCMAKE_BUILD_TYPE=Release "-DEIGEN3_INCLUDE_DIR=$EIGEN_TF")

# AVX-512 must be OFF everywhere on hosts that advertise it:
#  - the TF-wheel Eigen's AVX512-FP16 kernels don't compile under g++ 12
#    (template specialization syntax error in PacketMathFP16.h);
#  - with plain AVX-512 enabled the built mono_tum dies with heap
#    corruption ("double free or corruption") in the line global BA —
#    the reference's ORB-SLAM2-era Eigen usage is not 64-byte-alignment
#    clean. Measured on a cooperlake host; an avx2-only host ran fine.
# -mno-avx512f after -march=native disables the whole AVX-512 family.
# EIGEN_MAX_ALIGN_BYTES=16 additionally caps Eigen's static alignment at
# what glibc malloc guarantees: a second host (full AVX-512 feature set)
# still hit "double free or corruption" in the line global BA even with
# AVX-512 compiled out — the ORB-SLAM2-era code lacks aligned-new
# annotations on several fixed-size-Eigen-member classes, so ANY >16-byte
# alignment requirement is unsound. Must be identical across g2o/DBoW2/
# main lib (Eigen types cross those ABI boundaries).
# REF_MARCH overrides the ISA baseline. Default x86-64-v2 (SSE4.2, no AVX
# at all): a THIRD host (AMX/sapphire-rapids feature set) reproduced the
# line-BA heap corruption even with -mno-avx512f + MAX_ALIGN_BYTES=16 —
# with AVX2 enabled, Eigen still emits 32-byte stores into the reference's
# unannotated fixed-size members. No-AVX is the only setting observed safe
# on every host so far; the accuracy comparison does not care about the
# reference's SIMD width (it changes wall time, not trajectories).
REF_MARCH="${REF_MARCH:--march=x86-64-v2}"
sed -i "s/-march=native/$REF_MARCH -DEIGEN_MAX_ALIGN_BYTES=16/g" \
  "$REF/CMakeLists.txt" \
  "$REF/Thirdparty/g2o/CMakeLists.txt" "$REF/Thirdparty/DBoW2/CMakeLists.txt"

echo "== Thirdparty/DBoW2"
cmake -S "$REF/Thirdparty/DBoW2" -B "$REF/Thirdparty/DBoW2/build" \
  "${CMFLAGS[@]}" > "$BUILD_DIR/dbow2_cfg.log"
make -C "$REF/Thirdparty/DBoW2/build" -j"$JOBS" \
  > "$BUILD_DIR/dbow2_make.log" 2>&1

echo "== Thirdparty/g2o"
cmake -S "$REF/Thirdparty/g2o" -B "$REF/Thirdparty/g2o/build" \
  "${CMFLAGS[@]}" "-DG2O_EIGEN3_INCLUDE=$EIGEN_TF" \
  > "$BUILD_DIR/g2o_cfg.log"
make -C "$REF/Thirdparty/g2o/build" -j"$JOBS" \
  > "$BUILD_DIR/g2o_make.log" 2>&1

echo "== libORB_SLAM2 + examples"
cmake -S "$REF" -B "$REF/build" "${CMFLAGS[@]}" > "$BUILD_DIR/main_cfg.log"
make -C "$REF/build" -j"$JOBS" > "$BUILD_DIR/main_make.log" 2>&1

echo "== tools/train_vocab"
g++ -O2 -std=c++14 -o "$REF/tools/train_vocab" "$REF/tools/train_vocab.cc" \
  -I"$REF" -I"$REF/include" -I"$EIGEN_TF" -I"$BUILD_DIR/eigen_compat" \
  $(pkg-config --cflags --libs opencv4) \
  -L"$REF/lib" -lORB_SLAM2 \
  -L"$REF/Thirdparty/DBoW2/lib" -lDBoW2 \
  -L"$REF/Thirdparty/g2o/lib" -lg2o \
  -Wl,-rpath,"$REF/lib" -Wl,-rpath,"$REF/Thirdparty/DBoW2/lib" \
  -Wl,-rpath,"$REF/Thirdparty/g2o/lib"

echo "== done: $REF/Examples/Monocular/mono_tum"
