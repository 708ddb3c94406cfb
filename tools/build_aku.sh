#!/bin/bash
# Offline build of the reference aku library + tools against the stub
# libsndfile and mini-lapackpp in tools/aku_stub (the reference's own
# CMake needs network access for lapackpp and a libsndfile dev
# package, neither of which exists on this host).  Bypasses CMake:
# compiles aku/*.cc + vendored kiss_fft directly and links each tool
# against system liblapack/libblas.
#
# Usage: tools/build_aku.sh [tool ...]   (default: feacat stats align
#                                         estimate phone_probs)
set -e
REF=/root/reference
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STUB="$REPO/tools/aku_stub"
OUT="$REPO/build/aku"
mkdir -p "$OUT/obj"

CXX=${CXX:-g++}
# -include iostream: gconvert.cc uses std::cout without including
# <iostream> (compiled under older libstdc++ transitive includes)
CXXFLAGS="-O2 -std=gnu++0x -w -DKISS_FFT -include iostream -I$STUB -I$REF/aku -I$REF/vendor/kiss_fft"

SOURCES="FeatureGenerator FeatureModules AudioReader ModuleConfig \
HmmSet PhnReader ModelModules SpeakerConfig Recipe conf io str endian \
Distributions LinearAlgebra HmmNetBaumWelch Lattice Viterbi PhonePool \
MllrTrainer ziggurat mtw LmbfgsOptimize RegClassTree SegErrorEvaluator \
util PhoneProbsToolbox"

for s in $SOURCES; do
  o="$OUT/obj/$s.o"
  if [ ! -f "$o" ] || [ "$REF/aku/$s.cc" -nt "$o" ]; then
    echo "CXX $s.cc"
    $CXX $CXXFLAGS -c "$REF/aku/$s.cc" -o "$o"
  fi
done

for c in kiss_fft kiss_fftr; do
  o="$OUT/obj/$c.o"
  [ -f "$o" ] || { echo "CC  $c.c";
    CF=${CXXFLAGS/-include iostream/}; CF=${CF/-std=gnu++0x/}
    $CXX $CF -x c -c "$REF/vendor/kiss_fft/$c.c" -o "$o"; }
done

o="$OUT/obj/sndfile_stub.o"
if [ ! -f "$o" ] || [ "$STUB/sndfile_stub.cpp" -nt "$o" ]; then
  echo "CXX sndfile_stub.cpp"
  $CXX $CXXFLAGS -c "$STUB/sndfile_stub.cpp" -o "$o"
fi

ar rcs "$OUT/libaku.a" "$OUT"/obj/*.o

# no lapack/blas dev symlinks on this host: link the runtime .so.3
LAPACK="$(ldconfig -p | awk '/liblapack.so.3/ {print $NF; exit}')"
BLAS="$(ldconfig -p | awk '/libblas.so.3/ {print $NF; exit}')"

TOOLS="${@:-feacat stats align estimate phone_probs}"
for t in $TOOLS; do
  echo "LD  $t"
  $CXX $CXXFLAGS "$REF/aku/$t.cc" -o "$OUT/$t" \
    "$OUT/libaku.a" "$LAPACK" "$BLAS"
done
echo "built: $OUT"
