#!/bin/bash
# Build the reference PL-StVO core (/root/reference) as a benchmarkable
# binary in this image (OpenCV 4.6 system, Eigen from the tensorflow wheel,
# no Boost / yaml-cpp -> config+dataset layers replaced by bench_main.cpp).
#
# Round-1 could not build this (no OpenCV C++ dev stack was found); the
# stack IS present now, so BASELINE.md's measured rows come from this
# script.  The reference tree is copied to a scratch dir and minimally
# patched -- patches listed below are API/toolchain shims only, no
# behavioral change:
#   * config.cpp: drop yaml-cpp loadFromFile (defaults ctor kept verbatim;
#     we never load YAML -- bench runs the reference DEFAULT config)
#   * pinholeStereoCamera.cpp: drop the YAML ctor (plain ctor kept)
#   * OpenCV 3->4 renames: CV_RGB2GRAY/CV_BGR2GRAY/CV_GRAY2BGR/CV_BGRA2BGR
#     -> cv::COLOR_*, ORB scoreType int -> enum cast, #include <random>
#   * compat headers: opencv/cv.h + cv.h -> opencv2/opencv.hpp; eigen3 ->
#     tensorflow's bundled Eigen
#   * -std=c++17 (aligned operator new for AVX-512 Eigen fixed-size
#     members), -mno-avx512fp16 (TF-Eigen FP16 kernels miss template<>
#     markers under g++12)
set -e
SRC=${1:-/root/reference}
DST=${2:-/tmp/refbuild}
EIG=/opt/venv/lib/python3.12/site-packages/tensorflow/include

rm -rf "$DST"
cp -r "$SRC" "$DST"
cd "$DST"

ln_load=$(grep -n "^template<typename T>" src/config.cpp | head -1 | cut -d: -f1)
head -n $((ln_load-1)) src/config.cpp > src/config_patched.cpp
sed -i '/#include <boost\/filesystem.hpp>/d; /#include <yaml-cpp\/yaml.h>/d' src/config_patched.cpp
echo 'void Config::loadFromFile( const std::string & ) {}' >> src/config_patched.cpp

cam_ln=$(grep -n "PinholeStereoCamera::PinholeStereoCamera( int width_, int height_, double fx_" src/pinholeStereoCamera.cpp | head -1 | cut -d: -f1)
{ sed -n "1,29p" src/pinholeStereoCamera.cpp | sed '/#include <boost\/filesystem.hpp>/d; /#include <yaml-cpp\/yaml.h>/d'; sed -n "${cam_ln},\$p" src/pinholeStereoCamera.cpp; } > src/pinholeStereoCamera_patched.cpp

sed -i 's/CV_RGB2GRAY/cv::COLOR_RGB2GRAY/; s/CV_GRAY2BGR/cv::COLOR_GRAY2BGR/; s/CV_BGRA2BGR/cv::COLOR_BGRA2BGR/' src/stereoFrame.cpp
sed -i 's/CV_BGR2GRAY/cv::COLOR_BGR2GRAY/; s/CV_GRAY2BGR/cv::COLOR_GRAY2BGR/' src/stereoFrameHandler.cpp
sed -i 's/Config::orbScore(),/static_cast<cv::ORB::ScoreType>(Config::orbScore()),/' src/stereoFrame.cpp
grep -q "#include <random>" src/stereoFrameHandler.cpp || \
  sed -i 's/#include <stereoFrameHandler.h>/#include <stereoFrameHandler.h>\n#include <random>/' src/stereoFrameHandler.cpp

mkdir -p compat/opencv
printf '#include <opencv2/opencv.hpp>\n' > compat/opencv/cv.h
cp compat/opencv/cv.h compat/cv.h
ln -sfn "$EIG" compat/eigen3

cp "$(dirname "$0")/bench_main.cpp" bench_main.cpp

g++ -O3 -march=native -mno-avx512fp16 -std=c++17 \
  -I include -I 3rdparty/line_descriptor/include -I compat -I "$EIG" \
  $(pkg-config --cflags opencv4) \
  bench_main.cpp src/config_patched.cpp src/auxiliar.cpp \
  src/pinholeStereoCamera_patched.cpp src/stereoFeatures.cpp \
  src/stereoFrame.cpp src/stereoFrameHandler.cpp src/matching.cpp \
  src/gridStructure.cpp src/lineIterator.cpp src/timer.cpp \
  3rdparty/line_descriptor/src/LSDDetector_custom.cpp \
  3rdparty/line_descriptor/src/binary_descriptor_custom.cpp \
  3rdparty/line_descriptor/src/binary_descriptor_matcher.cpp \
  3rdparty/line_descriptor/src/draw_custom.cpp \
  $(pkg-config --libs opencv4) -lpthread -o stvo_bench
echo "built $DST/stvo_bench"
