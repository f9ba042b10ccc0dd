#!/bin/bash
# Build the reference libtoolame-dab as a shared library into .scratch/ so the
# test suite can generate golden MP2 output to compare against.  Nothing from
# the reference tree is copied into this repository; the .so lives in the
# gitignored .scratch/ directory.
set -euo pipefail
REF=${1:-/root/reference}
OUT=$(dirname "$0")/../.scratch
mkdir -p "$OUT"
SRCS="common.c encode.c ieeefloat.c toolame.c portableio.c psycho_n1.c psycho_0.c \
psycho_1.c psycho_2.c psycho_3.c psycho_4.c fft.c subband.c bitstream.c mem.c \
crc.c tables.c availbits.c ath.c encode_new.c utils.c"
cd "$REF/libtoolame-dab"
gcc -O2 -ggdb -DNEWENCODE -fPIC -shared -o "$OUT/libtoolame-dab.so" $SRCS -lm
echo "built $OUT/libtoolame-dab.so"
