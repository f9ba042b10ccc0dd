#!/bin/bash
# Build the reference edioutput + shim into .scratch/ for byte-exact EDI tests.
set -euo pipefail
REF=${1:-/root/reference}
OUT=$(cd "$(dirname "$0")/.." && pwd)/.scratch
mkdir -p "$OUT/ediobj"
DEFS='-DPACKAGE_NAME="odr-audioenc" -DPACKAGE_VERSION="3.6.0"'
for f in "$REF/contrib/crc.c" "$REF/contrib/fec/init_rs_char.c" \
         "$REF/contrib/fec/encode_rs_char.c" "$REF/contrib/fec/decode_rs_char.c"; do
  gcc -O2 -fPIC -c -I"$REF/contrib" -o "$OUT/ediobj/$(basename "$f").o" "$f"
done
g++ -O2 -fPIC -shared -DPACKAGE_NAME='"odr-audioenc"' -DPACKAGE_VERSION='"3.6.0"' \
  -I"$REF" -I"$REF/contrib" -o "$OUT/libedi_ref.so" \
  "$(dirname "$0")/edi_ref_shim.cpp" \
  "$REF/contrib/edioutput/TagItems.cpp" \
  "$REF/contrib/edioutput/TagPacket.cpp" \
  "$REF/contrib/edioutput/AFPacket.cpp" \
  "$REF/contrib/edioutput/PFT.cpp" \
  "$REF/contrib/ReedSolomon.cpp" \
  "$REF/contrib/Log.cpp" "$REF/contrib/Globals.cpp" \
  "$OUT"/ediobj/*.o
echo "built $OUT/libedi_ref.so"
