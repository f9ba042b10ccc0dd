#!/bin/bash
# Build the reference fdk-aac DECODER (plus support libs) as a shared library
# into .scratch/ - used only as a test oracle for loopback-decoding the DAB+
# superframes our encoder produces (same role as the reference's --decode
# path, src/AACDecoder.cpp).  Nothing is copied into the repository.
set -euo pipefail
REF=${1:-/root/reference}/fdk-aac
OUT=$(cd "$(dirname "$0")/.." && pwd)/.scratch
mkdir -p "$OUT/fdkobj"
cd "$REF"

LIBS="libAACdec libMpegTPDec libSBRdec libPCMutils libFDK libSYS libArithCoding libDRCdec libSACdec libSACenc"
INC=""
for l in $LIBS libAACenc libSBRenc libMpegTPEnc; do
  INC="$INC -I$REF/$l/include -I$REF/$l/src"
done

OBJS=""
for l in $LIBS; do
  for f in $l/src/*.cpp; do
    o="$OUT/fdkobj/$(echo "$f" | tr '/' '_').o"
    if [ ! -f "$o" ] || [ "$f" -nt "$o" ]; then
      g++ -O2 -fPIC -c $INC -o "$o" "$f" 2>/dev/null || g++ -O2 -fPIC -c $INC -o "$o" "$f"
    fi
    OBJS="$OBJS $o"
  done
done
g++ -shared -o "$OUT/libfdk-dec.so" $OBJS
echo "built $OUT/libfdk-dec.so"
