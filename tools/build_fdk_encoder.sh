#!/bin/bash
# Build the reference (DAB-patched) fdk-aac ENCODER as a shared library into
# .scratch/ - used to generate golden DAB+ superframes for quality/parity
# testing.  Nothing is copied into the repository.
set -euo pipefail
REF=${1:-/root/reference}/fdk-aac
OUT=$(cd "$(dirname "$0")/.." && pwd)/.scratch
mkdir -p "$OUT/fdkobj"
cd "$REF"

LIBS="libAACenc libSBRenc libMpegTPEnc libFDK libSYS libPCMutils libSACenc"
INC=""
for l in libAACenc libSBRenc libMpegTPEnc libFDK libSYS libPCMutils libAACdec libMpegTPDec libSBRdec libArithCoding libDRCdec libSACdec libSACenc; do
  INC="$INC -I$REF/$l/include -I$REF/$l/src"
done

OBJS=""
for l in $LIBS; do
  for f in $l/src/*.cpp; do
    o="$OUT/fdkobj/$(echo "$f" | tr '/' '_').o"
    if [ ! -f "$o" ] || [ "$f" -nt "$o" ]; then
      g++ -O2 -fPIC -c $INC -o "$o" "$f"
    fi
    OBJS="$OBJS $o"
  done
done
g++ -shared -o "$OUT/libfdk-enc.so" $OBJS
echo "built $OUT/libfdk-enc.so"
