#!/usr/bin/env python3
"""Extract the numeric constant tables needed for DAB MP2 encoding from the
reference implementation's headers/sources and store them as .npz.

The tables themselves are data from ISO 11172-3 / ISO 13818-3 and ETS 300 401
(analysis window C.1, alloc tables B.2x, scalefactors B.1, quant coeffs C.5/C.6,
psy-model-1 critical band / masking-threshold tables D.x).  We capture the exact
decimal-rounded values the reference uses (several tables are decimal-rounded in
the C source, e.g. quant coeff b[11] = -0.000976563 != -1/1024, and that rounding
is observable in the output bits), so they are extracted from the C text rather
than recomputed from formulas.

Usage: python tools/gen_tables.py [REFERENCE_DIR]
Writes: odr_audioenc_tpu/data/mp2_tables.npz

Reference files parsed (read-only):
  libtoolame-dab/enwindow.h      (512-tap analysis window)
  libtoolame-dab/encode_new.c    (step/bits/group/SNR/scalefactor/a/b tables)
  libtoolame-dab/critband.h      (SecondCriticalBand[7][28])
  libtoolame-dab/freqtable.h     (SecondFreqEntries/SecondFreqSubband)
"""
import re
import sys
import numpy as np
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "odr_audioenc_tpu" / "data" / "mp2_tables.npz"


def numbers(text):
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)  # strip C comments
    text = re.sub(r"//[^\n]*", "", text)
    return [float(x) for x in re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", text)]


def extract_array(src, decl, count, dtype=np.float64):
    """Extract `count` numbers following a C array declaration `decl`."""
    i = src.index(decl)
    j = src.index("{", i)
    # find matching closing brace
    depth = 0
    for k in range(j, len(src)):
        if src[k] == "{":
            depth += 1
        elif src[k] == "}":
            depth -= 1
            if depth == 0:
                break
    vals = numbers(src[j : k + 1])
    assert len(vals) == count, f"{decl}: got {len(vals)} values, want {count}"
    return np.asarray(vals, dtype=dtype)


def main():
    tables = {}

    # --- analysis window (ISO 11172-3 Table C.1) ---
    enw = (REF / "libtoolame-dab" / "enwindow.h").read_text()
    tables["enwindow"] = extract_array(enw, "enwindow[512]", 512)

    # --- encode tables ---
    enc = (REF / "libtoolame-dab" / "encode_new.c").read_text()
    tables["step_index"] = extract_array(enc, "step_index[9][16]", 9 * 16, np.int32).reshape(9, 16)
    tables["nbal"] = extract_array(enc, "nbal[9]", 9, np.int32)
    tables["steps"] = extract_array(enc, "steps[18]", 18, np.int32)
    tables["steps2n"] = extract_array(enc, "steps2n[18]", 18, np.int32)
    tables["bits"] = extract_array(enc, "bits[18]", 18, np.int32)
    # two `group` declarations exist; strip comments first so we pick the
    # live one, not the commented-out legacy table
    enc_nc = re.sub(r"//[^\n]*", "", enc)
    tables["group"] = extract_array(enc_nc, "static int group[18]", 18, np.int32)
    tables["table_sblimit"] = extract_array(enc, "table_sblimit[5]", 5, np.int32)
    line = extract_array(enc, "line[5][SBLIMIT]", 5 * 32, np.int32).reshape(5, 32)
    tables["line"] = line
    tables["scalefactor"] = extract_array(enc, "scalefactor[64]", 64)
    tables["snr"] = extract_array(enc, "SNR[18]", 18)
    tables["quant_a"] = extract_array(enc, "a[18]", 18)
    tables["quant_b"] = extract_array(enc, "b[18]", 18)
    # sanity: a-1 ~= b (decimal-rounded in source)
    assert np.allclose(tables["quant_a"][1:] - 1.0, tables["quant_b"][1:], atol=1e-9)

    # --- psy model 1: critical band boundaries ---
    crit = (REF / "libtoolame-dab" / "critband.h").read_text()
    cb = extract_array(crit, "SecondCriticalBand[7][28]", 7 * 28, np.int32).reshape(7, 28)
    tables["crit_band_count"] = cb[:, 0]  # entries per samplerate index
    tables["cbound"] = cb[:, 1:]  # boundaries (first col of each row is count)

    # --- psy model 1: frequency band / bark / hear tables ---
    ft = (REF / "libtoolame-dab" / "freqtable.h").read_text()
    tables["freq_entries"] = extract_array(ft, "SecondFreqEntries[7]", 7, np.int32)
    sub = extract_array(ft, "SecondFreqSubband[7][132]", 7 * 132 * 3).reshape(7, 132, 3)
    tables["freq_line"] = sub[:, :, 0].astype(np.int32)
    tables["freq_bark"] = sub[:, :, 1]
    tables["freq_hear"] = sub[:, :, 2]

    # --- psy model 2: absolute threshold tables (absthr.h, absthr_table[4][513])
    at = (REF / "libtoolame-dab" / "absthr.h").read_text()
    tables["absthr"] = extract_array(at, "absthr_table[4][HBLKSIZE]",
                                     4 * 513).reshape(4, 513)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes): " + ", ".join(sorted(tables)))


if __name__ == "__main__":
    main()
